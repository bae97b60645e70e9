import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

H, W = 2160, 3840
rng = np.random.default_rng(0)
disp = jnp.asarray(rng.uniform(0, 64, (H, W)).astype(np.float32))
valid = jnp.asarray(rng.uniform(size=(H, W)) > 0.3)

def timeit(fn, *a, iters=4, label=""):
    o = fn(*a); float(np.asarray(o).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*a) for _ in range(iters)]
    for o in outs: float(np.asarray(o).ravel()[0])
    print(f"{label}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

big = jnp.int32(H*W)
lab0 = jnp.arange(H*W, dtype=jnp.int32).reshape(H, W)

# a) 18 local props only
from stereo_reconstruction_cv_tpu.ops import disparity as DP
def props_only(d, v):
    lab = jnp.where(v, lab0, big)
    conn_r = (jnp.abs(d[:, 1:] - d[:, :-1]) <= 32.) & v[:, 1:] & v[:, :-1]
    conn_d = (jnp.abs(d[1:, :] - d[:-1, :]) <= 32.) & v[1:, :] & v[:-1, :]
    for i in range(18):
        l = lab
        right = jnp.concatenate([l[:, 1:], jnp.full((H, 1), big)], axis=1)
        left = jnp.concatenate([jnp.full((H, 1), big), l[:, :-1]], axis=1)
        down = jnp.concatenate([l[1:, :], jnp.full((1, W), big)], axis=0)
        up = jnp.concatenate([jnp.full((1, W), big), l[:-1, :]], axis=0)
        cr = jnp.concatenate([conn_r, jnp.zeros((H, 1), bool)], axis=1)
        cl = jnp.concatenate([jnp.zeros((H, 1), bool), conn_r], axis=1)
        cd = jnp.concatenate([conn_d, jnp.zeros((1, W), bool)], axis=0)
        cu = jnp.concatenate([jnp.zeros((1, W), bool), conn_d], axis=0)
        l = jnp.minimum(l, jnp.where(cr, right, big))
        l = jnp.minimum(l, jnp.where(cl, left, big))
        l = jnp.minimum(l, jnp.where(cd, down, big))
        lab = jnp.minimum(l, jnp.where(cu, up, big))
    return lab.sum()
timeit(jax.jit(props_only), disp, valid, label="18 local props")

# b) 6 pointer jumps only
def jumps_only(d, v):
    lab = jnp.where(v, lab0, big)
    for i in range(6):
        flat = lab.reshape(-1)
        flat = jnp.where(flat < big, jnp.minimum(flat, flat[jnp.clip(flat, 0, H*W-1)]), flat)
        lab = flat.reshape(H, W)
    return lab.sum()
timeit(jax.jit(jumps_only), disp, valid, label="6 pointer jumps")

# c) sizes scatter + region gather
def sizes_only(d, v):
    lab = jnp.where(v, lab0, big)
    sizes = jnp.zeros(H*W+1, jnp.int32).at[lab.reshape(-1)].add(1)
    region = sizes[lab]
    return region.sum()
timeit(jax.jit(sizes_only), disp, valid, label="sizes scatter+gather")
