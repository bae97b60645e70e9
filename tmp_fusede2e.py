import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, cv2
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP, rectify as RC, geometry as G

imL = cv2.imread("/root/reference/dataset/d1/img1.jpg", 0)
imR = cv2.imread("/root/reference/dataset/d1/img2.jpg", 0)
H, W = imL.shape
K = np.array([[2253.71, 0, 1929.69], [0, 2244.72, 1057.63], [0, 0, 1.0]])
geo = RC.stereo_rectify(jnp.asarray(K), None, jnp.asarray(K), None, (W, H),
                        jnp.asarray(np.eye(3)), jnp.asarray([-0.14, 0., 0.]), alpha=0.0)
Kj = jnp.asarray(K, jnp.float32)
Q = jnp.asarray(geo.Q, jnp.float32)
cfg = SGBMConfig(num_disparities=256, num_directions=8)
core = cfg.with_(speckle_window_size=0)
R1, P1 = jnp.asarray(geo.R1, jnp.float32), jnp.asarray(geo.P1, jnp.float32)
R2, P2 = jnp.asarray(geo.R2, jnp.float32), jnp.asarray(geo.P2, jnp.float32)

@jax.jit
def e2e(l, r):
    rl = RC.rectify_remap(l, Kj, None, R1, P1)
    rr = RC.rectify_remap(r, Kj, None, R2, P2)
    d, v = DP.sgbm_disparity(rl, rr, core)
    v = DP.speckle_filter(d, v, cfg.speckle_window_size, float(cfg.speckle_range))
    pts = G.reproject_image_to_3d(d, Q)
    return jnp.sum(jnp.where(v[..., None], pts, 0.0))

l, r = jnp.asarray(imL), jnp.asarray(imR)
t0 = time.perf_counter()
float(np.asarray(e2e(l, r)))
print("compile+first:", round(time.perf_counter()-t0, 1), "s", flush=True)
float(np.asarray(e2e(l, r)))
t0 = time.perf_counter()
outs = [e2e(l, r) for _ in range(4)]
for o in outs: float(np.asarray(o))
dt = (time.perf_counter()-t0)/4
print(f"fused e2e 4K/256: {dt*1000:.0f} ms = {1/dt:.2f} fps", flush=True)
