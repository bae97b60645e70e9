"""Microbenchmark: global flat sort vs batched row-slab sorts (tools/).

The r3 4K profile charges 33.5 ms to _component_keep_sort's two flat
8.3M-element sorts. The slab plan (see ops/disparity.py
_component_keep_slab) replaces them with B batched sorts of
(S + m) * W elements each; this measures whether XLA's batched sort of
(B, L) along the last axis beats one (B * L,) sort enough to pay for the
~1.8x element inflation from slab overlap.

Usage: python tools/micro_sort.py [S,S,...]   (slab strides; default 128,256,512)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu.utils.timing import timed_chain


def main():
    strides = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                                else ["128", "256", "512"])]
    H, W, m = 2160, 3840, 100
    N = H * W
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.integers(0, N, (H, W)), jnp.int32)
    lab = jax.device_put(lab)
    jax.block_until_ready(lab)

    def t(fn, label):
        try:
            dt = timed_chain(fn, (lab,), iters=4)
            print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    def flat_two_sorts(l):
        flat = l.reshape(-1)
        idx = jnp.arange(N, dtype=jnp.int32)
        sl, si = jax.lax.sort((flat, idx), num_keys=1)
        keep = (sl[1:] != sl[:-1])
        packed = jax.lax.sort(si * 2 + jnp.pad(keep, (0, 1)).astype(jnp.int32))
        return jnp.sum(packed & 1)

    t(flat_two_sorts, "flat 8.3M x2 sorts (shipped shape)")

    for S in strides:
        B = -(-H // S)
        L = (S + m) * W

        def slab_two_sorts(l, S=S, B=B, L=L):
            lp = jnp.pad(l, ((0, B * S + m - H), (0, 0)), constant_values=N)
            slabs = jnp.stack([
                jax.lax.dynamic_slice_in_dim(lp, b * S, S + m, 0)
                for b in range(B)
            ]).reshape(B, L)
            idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
            sl, si = jax.lax.sort((slabs, idx), dimension=1, num_keys=1)
            keep = (sl[:, 1:] != sl[:, :-1])
            packed = jax.lax.sort(
                si * 2 + jnp.pad(keep, ((0, 0), (0, 1))).astype(jnp.int32),
                dimension=1)
            return jnp.sum(packed & 1)

        t(slab_two_sorts, f"slabs S={S} ({B}x{(S+m)*W/1e6:.2f}M) x2 sorts")


if __name__ == "__main__":
    main()
