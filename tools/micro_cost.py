"""Microbenchmark: cost-producer strip width / rows-per-step (tools/).

r3 4K profiles: 42.6 ms at D=128, 60.5 ms at D=256 — the per-row shift
trees don't shrink with D, so strip width (tree amortization) and R
(panel-roll amortization) are the levers.

Usage: python tools/micro_cost.py [D] [wt:rows,wt:rows,...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import cost_volume_pallas
from stereo_reconstruction_cv_tpu.utils.timing import timed_chain


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    combos = sys.argv[2].split(",") if len(sys.argv) > 2 else ["0:0"]
    H, W = 2160, 3840
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    r = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    l, r = jax.device_put((l, r))
    jax.block_until_ready((l, r))

    def step(a, b, wt, rows):
        sl = DP.xsobel_clip(a, 63)
        sr = DP.xsobel_clip(b, 63)
        C = cost_volume_pallas(
            sl, sr, a.astype(jnp.int32), b.astype(jnp.int32), D, 0,
            wt=wt or None, rows=rows or None,
        )
        return jnp.sum(C[::97, ::97, :].astype(jnp.int32))

    for combo in combos:
        wt, rows = (int(x) for x in combo.split(":"))
        try:
            dt = timed_chain(
                lambda a, b, wt=wt, rows=rows: step(a, b, wt, rows), (l, r),
                iters=4)
            print(f"wt={wt or 'dflt'} rows={rows or 'dflt'}: {dt*1e3:.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"wt={wt} rows={rows}: FAIL {type(e).__name__}: {e}"[:160],
                  flush=True)


if __name__ == "__main__":
    main()
