import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, cv2
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP
imL = cv2.imread("/root/reference/dataset/d1/img1.jpg", 0)
imR = cv2.imread("/root/reference/dataset/d1/img2.jpg", 0)
l, r = jnp.asarray(imL), jnp.asarray(imR)
for D in (256, 128):
    cfg = SGBMConfig(num_disparities=D, num_directions=8, speckle_window_size=0)
    fn = jax.jit(lambda a, b, c=cfg: DP.sgbm_disparity(a, b, c)[0].sum())
    float(np.asarray(fn(l, r)))
    t0 = time.perf_counter()
    outs = [fn(l, r) for _ in range(3)]
    for o in outs: float(np.asarray(o))
    dt = (time.perf_counter()-t0)/3
    print(f"4K/{D}: {dt*1000:.0f} ms = {2160*3840/1e6/dt:.1f} MPix/s", flush=True)
