"""Microbenchmark: primitives for the speckle component-size step (tools/).

_component_keep_sort costs ~34 ms at 4K (two 8.3M-element sorts). Times
the candidate primitives on-chip so the replacement design is grounded:
one-operand sort, key+payload sort, 1D table gather with random indices,
permutation scatter-set, and N-bin scatter-add histogram.

Usage: python tools/micro_sort.py
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
    H, W = 2160, 3840
    N = H * W
    rng = np.random.default_rng(0)
    # Label-like data: many repeats, values in [0, N)
    lab = jnp.asarray(rng.integers(0, N // 50, N).astype(np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    bits = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))
    table = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
    lab, perm, bits, table = jax.device_put((lab, perm, bits, table))
    jax.block_until_ready((lab, perm, bits, table))

    # Every case must DEPEND on the chained first argument `l` (timed_chain
    # perturbs only arg 0) or XLA computes it once and CSEs the chain — the
    # scatter case measured a bogus 8 ms that way (real: ~52 ms).
    cases = {
        "sort_1op": lambda l, p, b, t: jax.lax.sort(l),
        "sort_key_payload": lambda l, p, b, t: jax.lax.sort((l, p), num_keys=1)[0],
        "gather_table": lambda l, p, b, t: t[l],
        "scatter_set_perm": lambda l, p, b, t: jnp.zeros(N, jnp.int32).at[p].set(l & 1),
        "cumsum": lambda l, p, b, t: jnp.cumsum(l & 1),
        "cummax": lambda l, p, b, t: jax.lax.cummax(l),
    }
    for name, fn in cases.items():
        try:
            dt = timed_chain(
                lambda l, p, b, t, fn=fn: jnp.sum(fn(l, p, b, t), dtype=jnp.int32),
                (lab, perm, bits, table), iters=6)
            print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:160], flush=True)


if __name__ == "__main__":
    main()
