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
Kj = jnp.asarray(K, jnp.float32); Q = jnp.asarray(geo.Q, jnp.float32)
cfg = SGBMConfig(num_disparities=256, num_directions=8)
core = cfg.with_(speckle_window_size=0)
R1, P1 = jnp.asarray(geo.R1, jnp.float32), jnp.asarray(geo.P1, jnp.float32)
R2, P2 = jnp.asarray(geo.R2, jnp.float32), jnp.asarray(geo.P2, jnp.float32)

def timeit(f, *a, n=4, label=""):
    o = f(*a); jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], o)
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(n)]
    for o in outs: jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], o)
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.0f} ms", flush=True)
    return o

rect = jax.jit(lambda a, b: (RC.rectify_remap(a, Kj, None, R1, P1), RC.rectify_remap(b, Kj, None, R2, P2)))
l, r = jnp.asarray(imL), jnp.asarray(imR)
rl, rr = timeit(rect, l, r, label="rect both")
sgbm = jax.jit(lambda a, b: DP.sgbm_disparity(a, b, core))
d, v = timeit(sgbm, rl, rr, label="sgbm 4K/256 (real)")
spk = jax.jit(lambda a, b: DP.speckle_filter(a, b, 100, 32.0))
v2 = timeit(spk, d, v, label="speckle (real)")
rep = jax.jit(lambda d_, v_: jnp.sum(jnp.where(v_[..., None], G.reproject_image_to_3d(d_, Q), 0.0)))
timeit(rep, d, v2, label="reproject+sum")
