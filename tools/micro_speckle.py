"""Microbenchmark: speckle flood rounds-per-check + sizes sort (tools/).

The 4K profile puts speckle at ~60 ms flood + ~34 ms sort — the largest
single SGBM stage. This times the while_loop body with 1 vs 2 flood
rounds per convergence check on a REAL 4K disparity map (round count is
content-dependent), and reports the converged round count.

Usage: python tools/micro_speckle.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu import benchmarks as B
from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops.pallas.speckle_pallas import flood_round_pallas
from stereo_reconstruction_cv_tpu.utils.timing import rtt, timed_chain


def speckle_variant(disp, valid, rounds_per_iter, max_diff=32.0, max_rounds=64,
                    ht=64, wt=128):
    """speckle_filter's flood loop with a configurable body width; returns
    (keep, rounds_used)."""
    H, W = disp.shape
    lab0 = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab0 = jnp.where(valid, lab0, jnp.int32(H * W))
    conn_r = (jnp.abs(disp[:, 1:] - disp[:, :-1]) <= max_diff) & valid[:, 1:] & valid[:, :-1]
    conn_d = (jnp.abs(disp[1:, :] - disp[:-1, :]) <= max_diff) & valid[1:, :] & valid[:-1, :]
    ch = jnp.concatenate([jnp.zeros((H, 1), bool), conn_r], axis=1).astype(jnp.int32)
    cv = jnp.concatenate([jnp.zeros((1, W), bool), conn_d], axis=0).astype(jnp.int32)
    one_round = lambda lab: flood_round_pallas(lab, ch, cv, ht=ht, wt=wt)

    def cond(state):
        _, changed, i = state
        return changed & (i < max_rounds)

    def body(state):
        lab, _, i = state
        new, changed = lab, jnp.bool_(False)
        for _ in range(rounds_per_iter):
            new, c = one_round(new)
            changed |= c
        return new, changed, i + rounds_per_iter

    lab_init, chg_init = one_round(lab0)
    lab, _, n = jax.lax.while_loop(
        cond, body, (lab_init, chg_init, jnp.int32(1))
    )
    return lab, n


def main():
    imL, imR = B._load_pair("d1")
    l, r = jnp.asarray(imL), jnp.asarray(imR)
    cfg = SGBMConfig(num_disparities=128, num_directions=5, speckle_window_size=0)
    disp, valid = jax.jit(lambda a, b: DP.sgbm_disparity(a, b, cfg))(l, r)
    D = cfg.num_disparities
    disp = jnp.pad(disp, ((0, 0), (0, 0)))
    jax.block_until_ready((disp, valid))
    print(f"rtt {rtt()*1e3:.1f} ms", flush=True)

    combos = [(1, 64, 128), (1, 128, 128), (1, 128, 256), (1, 256, 256),
              (2, 64, 128)]
    if len(sys.argv) > 1:  # "rpi:ht:wt,..." override
        combos = [tuple(int(x) for x in c.split(":")) for c in sys.argv[1].split(",")]
    for rpi, ht, wt in combos:
        fn = jax.jit(lambda d, v, rpi=rpi, ht=ht, wt=wt: speckle_variant(
            d, v, rpi, ht=ht, wt=wt))
        lab, n = fn(disp, valid)
        jax.block_until_ready((lab, n))
        dt = timed_chain(
            lambda d, v, rpi=rpi, ht=ht, wt=wt: speckle_variant(
                d, v, rpi, ht=ht, wt=wt)[0],
            (disp, valid), iters=6)
        print(f"rpi={rpi} ht={ht} wt={wt}: {dt*1e3:.2f} ms "
              f"(converged at round {int(n)})", flush=True)

    # sizes sort on the converged labels
    lab, _ = jax.jit(lambda d, v: speckle_variant(d, v, 2))(disp, valid)
    lab.block_until_ready()
    dt = timed_chain(lambda l_: DP._component_keep_sort(l_, 100), (lab,), iters=6)
    print(f"component_keep_sort: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
