import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, cv2
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import cost_volume_pallas
from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP

imL = cv2.resize(cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (1280, 720))
imR = cv2.resize(cv2.imread("/root/reference/dataset/d2/img2.jpg", 0), (1280, 720))
l, r = jnp.asarray(imL), jnp.asarray(imR)
D = 128
cfg = SGBMConfig(num_disparities=D, num_directions=8)

def timeit(f, *a, n=8, label=""):
    o = f(*a); float(np.asarray(o))
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(n)]
    for o in outs: float(np.asarray(o))
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)

def prep(a, b):
    cap = 63
    sl = DP.xsobel_clip(a, cap); sr = DP.xsobel_clip(b, cap)
    capv = jnp.int32(cap)
    ps = []
    for p in (sl, sr, a.astype(jnp.int32), b.astype(jnp.int32)):
        ps.append(p.at[:, 0].set(capv).at[:, -1].set(capv))
    return ps

@jax.jit
def cost_only(a, b):
    sl, sr, rl, rr = prep(a, b)
    return jnp.sum(cost_volume_pallas(sl, sr, rl, rr, D, 0).astype(jnp.int32))
timeit(cost_only, l, r, label="cost (fused pallas)")

@jax.jit
def cost_vert(a, b):
    sl, sr, rl, rr = prep(a, b)
    C = cost_volume_pallas(sl, sr, rl, rr, D, 0)
    S = SP._vertical_directions(C.astype(jnp.int32) if C.dtype != jnp.int16 else C, 2904., 11616., 8, False)
    return jnp.sum(S)
timeit(cost_vert, l, r, label="cost + 2 vertical sweeps (6 dirs)")

@jax.jit
def cost_vert_h(a, b):
    sl, sr, rl, rr = prep(a, b)
    C = cost_volume_pallas(sl, sr, rl, rr, D, 0)
    Ci = C
    S = SP._vertical_directions(Ci, 2904., 11616., 8, False)
    S = SP._sweep_horizontal(Ci, S, 2904., 11616., reverse=False, interpret=False)
    return jnp.sum(S)
timeit(cost_vert_h, l, r, label="+ horizontal fwd")

@jax.jit
def full_wta(a, b):
    sl, sr, rl, rr = prep(a, b)
    C = cost_volume_pallas(sl, sr, rl, rr, D, 0)
    disp, valid, best, minS = SP.sgm_wta_pallas(C, 2904, 11616, 8, 10, 0)
    return jnp.sum(disp)
timeit(full_wta, l, r, label="+ horizontal rev fused WTA (full aggregation)")

@jax.jit
def full_sgbm(a, b):
    return jnp.sum(DP.sgbm_disparity(a, b, cfg)[0])
timeit(full_sgbm, l, r, label="full sgbm (lr + speckle)")
