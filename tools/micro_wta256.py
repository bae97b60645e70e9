"""Microbenchmark: fused hT_R+WTA sweep at 4K x 256 (VERDICT r4 item 4).

Times _sweep_hT_wta (the e2e config's largest stage: 100.2 ms in the r4
profile) standalone on synthetic volumes, before/after the two-level
butterfly fold. Usage: python tools/micro_wta256.py [dirs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP
from stereo_reconstruction_cv_tpu.utils.timing import rtt


def main():
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    Wc, H, D = 3584, 2160, 256
    rng = np.random.default_rng(0)
    CT = jnp.asarray(rng.integers(0, 22869, (Wc, H, D)), jnp.int16)
    dsT = jnp.asarray(rng.integers(0, 46464, (Wc, H, D)), jnp.uint16)
    jax.block_until_ready((CT, dsT))
    print(f"rtt {rtt()*1e3:.1f} ms", flush=True)

    it = 6

    def chain(ct, s0, other):
        def body(_, acc):
            eps = (acc * 0.0).astype(jnp.int32).astype(jnp.uint16)
            outs = SP._sweep_hT_wta(
                ct, s0 + eps, other if nd == 8 else None,
                float(8 * 3 * 121), float(32 * 3 * 121), nd, 10, 0, False)
            return acc + sum(jnp.sum(x, dtype=jnp.float32) for x in outs)
        return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

    fn = jax.jit(chain)
    float(np.asarray(fn(CT, dsT, dsT)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(CT, dsT, dsT)))
        best = min(best, time.perf_counter() - t0)
    dt = 1e3 * max(best - rtt(), 0.0) / it
    print(f"hT_R+WTA fused 4Kx{D} {nd}-dir: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
