"""Microbenchmark: SGM sweep inner-update variants (tools/, not shipped).

The r3 4K/128 profile: vertical triple 28.7 ms, hT 11.1 ms/dir — both
VPU-issue-bound (~1 T op/s). r3 carries are Λ-normalized (_sgm_delta +
_renorm); the remaining per-cell cost candidates: the cross-lane jnp.min
reduce inside _renorm (vs an explicit butterfly) and the two edge-mask
selects.

Usage: python tools/micro_sweep.py [D] [variant,variant,...]
variants: shipped_vert, shipped_ht, vert_bfly, ht_bfly
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl  # noqa: F401 (kernel variants)
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP
from stereo_reconstruction_cv_tpu.utils.timing import timed_chain

P1, P2 = 2904.0, 11616.0


def _renorm_bfly(cost, delta):
    """_renorm with the min reduce as a butterfly (replicated min)."""
    t = cost + delta
    D = t.shape[-1]
    m = t
    s = 1
    while s < D:
        m = jnp.minimum(m, pltpu.roll(m, np.int32(s), m.ndim - 1))
        s *= 2
    return t - m


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

    orig_renorm = SP._renorm
    for w in which:
        if w == "shipped_vert":
            t(lambda c: SP._vertical_sweep_auto(c, P1, P2, False, False),
              "vertical shipped", C)
        elif w == "vert_bfly":
            SP._renorm = _renorm_bfly
            try:
                t(lambda c: SP._vertical_sweep_auto(c, P1, P2, False, False),
                  "vertical bfly-renorm", C)
            finally:
                SP._renorm = orig_renorm
        elif w == "shipped_ht":
            CT = jnp.swapaxes(C, 0, 1)
            CT.block_until_ready()
            t(lambda ct: SP._sweep_hT(ct, None, P1, P2, False, False,
                                      accumulate=False), "hT shipped", CT)
        elif w == "ht_bfly":
            CT = jnp.swapaxes(C, 0, 1)
            CT.block_until_ready()
            SP._renorm = _renorm_bfly
            try:
                t(lambda ct: SP._sweep_hT(ct, None, P1, P2, False, False,
                                          accumulate=False), "hT bfly-renorm", CT)
            finally:
                SP._renorm = orig_renorm


if __name__ == "__main__":
    main()
