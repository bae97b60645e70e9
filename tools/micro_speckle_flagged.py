"""Microbenchmark: flagged (active-block-skipping) speckle flood vs r4.

Times the full speckle_filter (flood + keep sort) and its pieces on the
REAL e2e content: d1 4K pair at 256 disparities, 5 directions — the
configuration whose r4 profile recorded flood 57.6 ms + sort 35.4 ms
(docs/PROFILE_4K.json).

Usage: python tools/micro_speckle_flagged.py [out.json]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu import benchmarks as B
from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.utils.timing import rtt, timed_chain


def main():
    out = {}
    imL, imR = B._load_pair("d1")
    l, r = jnp.asarray(imL), jnp.asarray(imR)
    cfg = SGBMConfig(num_disparities=256, num_directions=5,
                     speckle_window_size=0)
    disp, valid = jax.jit(
        lambda a, b: DP.sgbm_disparity_auto(a, b, cfg))(l, r)
    jax.block_until_ready((disp, valid))
    out["rtt_ms"] = round(rtt() * 1e3, 2)
    print(f"rtt {out['rtt_ms']} ms", flush=True)

    # Full speckle stage (flagged flood + keep sort, margin-sliced)
    cfg_spk = cfg.with_(speckle_window_size=100)
    dt = timed_chain(
        lambda d, v: DP._speckle(d, v, cfg_spk), (disp, valid),
        iters=6)
    out["speckle_full_ms"] = round(dt * 1e3, 2)
    print(f"speckle stage (flagged, sliced): {dt*1e3:.2f} ms", flush=True)

    # Flood only (speckle with the sort skipped via huge threshold? no —
    # time the converged-label production by replicating the loop)
    from stereo_reconstruction_cv_tpu.ops.pallas.speckle_pallas import (
        flood_flag_init, flood_round_flagged)

    def flood_only(d, v):
        H, W = d.shape
        lab0 = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
        lab0 = jnp.where(v, lab0, jnp.int32(H * W))
        conn_r = (jnp.abs(d[:, 1:] - d[:, :-1]) <= 32.0) & v[:, 1:] & v[:, :-1]
        conn_d = (jnp.abs(d[1:, :] - d[:-1, :]) <= 32.0) & v[1:, :] & v[:-1, :]
        ch = jnp.concatenate([jnp.zeros((H, 1), bool), conn_r], axis=1).astype(jnp.int32)
        cv = jnp.concatenate([jnp.zeros((1, W), bool), conn_d], axis=0).astype(jnp.int32)

        def cond(s):
            return s[3] & (s[4] < 64)

        def body(s):
            lab, rf, cs, _, i = s
            lab, rf, cs, c = flood_round_flagged(lab, ch, cv, rf, cs)
            return lab, rf, cs, c, i + 1

        rf0, cs0 = flood_flag_init(H, W)
        lab, rf, cs, c = flood_round_flagged(lab0, ch, cv, rf0, cs0)
        lab, _, _, _, n = jax.lax.while_loop(
            cond, body, (lab, rf, cs, c, jnp.int32(1)))
        return lab, n

    # Flood/sort pieces measured on the production (margin-sliced) domain.
    x0 = cfg.min_disparity + cfg.num_disparities
    disp, valid = disp[:, x0:], valid[:, x0:]
    lab, n = jax.jit(flood_only)(disp, valid)
    jax.block_until_ready(lab)
    out["flood_rounds"] = int(n)
    dt = timed_chain(lambda d, v: flood_only(d, v)[0], (disp, valid), iters=6)
    out["flood_only_ms"] = round(dt * 1e3, 2)
    print(f"flood only: {dt*1e3:.2f} ms ({int(n)} rounds)", flush=True)

    dt = timed_chain(lambda l_: DP._component_keep_sort(l_, 100), (lab,),
                     iters=6)
    out["keep_sort_ms"] = round(dt * 1e3, 2)
    print(f"component_keep_sort: {dt*1e3:.2f} ms", flush=True)

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
