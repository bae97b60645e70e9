"""Microbenchmark: SGM sweep inner-update variants (tools/, not shipped).

The r3 4K/128 profile: vertical triple 28.7 ms, hT 11.1 ms/dir — both
VPU-issue-bound (~1 T op/s). The big per-cell cost candidates inside
_sgm_update: the cross-lane jnp.min reduce and the two edge-mask selects.
Variants: butterfly (replicated) min, hoisted edge masks.

Usage: python tools/micro_sweep.py [D] [variant,variant,...]
variants: shipped_vert, shipped_ht, vert_bfly, ht_bfly
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP
from stereo_reconstruction_cv_tpu.utils.timing import timed_chain

P1, P2 = 2904.0, 11616.0


def _sgm_update_bfly(prev, cost, p1, p2):
    """_sgm_update with the min reduce as a butterfly (replicated min)."""
    D = prev.shape[-1]
    big = jnp.asarray(SP.BIG, prev.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
    up = jnp.where(lane == D - 1, big,
                   pltpu.roll(prev, np.int32(D - 1), prev.ndim - 1))
    dn = jnp.where(lane == 0, big, pltpu.roll(prev, np.int32(1), prev.ndim - 1))
    m = prev
    s = 1
    while s < D:
        m = jnp.minimum(m, pltpu.roll(m, np.int32(s), m.ndim - 1))
        s *= 2
    best = jnp.minimum(jnp.minimum(prev, m + p2), jnp.minimum(up, dn) + p1)
    return cost + best - m


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["shipped_vert", "vert_bfly"])
    H, W = 2160, 3840
    Wc = W - D
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.integers(0, 20000, (H, Wc, D)), jnp.int16)
    C = jax.device_put(C)
    C.block_until_ready()

    def t(fn, label, *args):
        try:
            dt = timed_chain(fn, args, iters=4)
            print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    orig_update = SP._sgm_update
    for w in which:
        if w == "shipped_vert":
            t(lambda c: SP._vertical_sweep_auto(c, P1, P2, False, False),
              "vertical shipped", C)
        elif w == "vert_bfly":
            SP._sgm_update = _sgm_update_bfly
            try:
                t(lambda c: SP._vertical_sweep_auto(c, P1, P2, False, False),
                  "vertical bfly-min", C)
            finally:
                SP._sgm_update = orig_update
        elif w == "shipped_ht":
            CT = jnp.swapaxes(C, 0, 1)
            CT.block_until_ready()
            t(lambda ct: SP._sweep_hT(ct, None, P1, P2, False, False,
                                      accumulate=False), "hT shipped", CT)
        elif w == "ht_bfly":
            CT = jnp.swapaxes(C, 0, 1)
            CT.block_until_ready()
            SP._sgm_update = _sgm_update_bfly
            try:
                t(lambda ct: SP._sweep_hT(ct, None, P1, P2, False, False,
                                          accumulate=False), "hT bfly-min", CT)
            finally:
                SP._sgm_update = orig_update


if __name__ == "__main__":
    main()
