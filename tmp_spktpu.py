import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, cv2
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu import native
from stereo_reconstruction_cv_tpu.config import SGBMConfig

# correctness on real pair, on TPU
imL = cv2.resize(cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (640, 360))
imR = cv2.resize(cv2.imread("/root/reference/dataset/d2/img2.jpg", 0), (640, 360))
cfg = SGBMConfig(num_disparities=64, speckle_window_size=0)
d, v = jax.jit(lambda a, b: DP.sgbm_disparity(a, b, cfg))(jnp.asarray(imL), jnp.asarray(imR))
d = np.asarray(d); v = np.asarray(v)
dq = np.round(d*16).astype(np.int16).astype(np.float32)/16.0
keep = np.asarray(jax.jit(lambda a, b: DP.speckle_filter(a, b, 100, 32.0))(jnp.asarray(dq), jnp.asarray(v)))
ref = native.filter_speckles(dq, v.copy(), 100, 32.0)
print("d2 TPU speckle agree:", (keep == ref).mean(), flush=True)
assert (keep == ref).mean() == 1.0

# timing at 4K
H, W = 2160, 3840
rng = np.random.default_rng(0)
disp = jnp.asarray(rng.uniform(0, 64, (H, W)).astype(np.float32))
valid = jnp.asarray(rng.uniform(size=(H, W)) > 0.3)
f = jax.jit(lambda a, b: DP.speckle_filter(a, b, 100, 32.0).sum())
float(np.asarray(f(disp, valid)))
t0 = time.perf_counter()
outs = [f(disp, valid) for _ in range(4)]
for o in outs: float(np.asarray(o))
print(f"speckle 4K (random, worst-case): {(time.perf_counter()-t0)/4*1000:.1f} ms", flush=True)
# realistic map: smooth disparity + noise speckles
base = np.tile(np.linspace(5, 60, W, dtype=np.float32), (H, 1))
noise = rng.uniform(size=(H, W)) < 0.02
dmap = jnp.asarray(np.where(noise, rng.uniform(0, 64, (H, W)), base).astype(np.float32))
vmap_ = jnp.asarray(rng.uniform(size=(H, W)) > 0.15)
float(np.asarray(f(dmap, vmap_)))
t0 = time.perf_counter()
outs = [f(dmap, vmap_) for _ in range(4)]
for o in outs: float(np.asarray(o))
print(f"speckle 4K (realistic): {(time.perf_counter()-t0)/4*1000:.1f} ms", flush=True)
print("SPECKLE TPU OK")
