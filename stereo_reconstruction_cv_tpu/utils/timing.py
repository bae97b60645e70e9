"""Chained device timing that excludes host<->device relay latency.

The async-dispatch loop used through round 2 (dispatch N executions, then
fetch N scalars) still pays one SERIAL relay round-trip per fetched
scalar — through the axon dev relay that is ~25-30 ms, which floors every
measurement: a 2 ms kernel and a 30 ms kernel both "measure" ~30 ms
(discovered in round 3 when xsobel on one image timed slower than on two;
tools/timing.py history). Production hosts attach over PCIe and do not
pay this latency, so charging it to per-frame numbers misstates both the
kernel costs and the framework's throughput.

Here the step runs `iters` times INSIDE one jit via lax.fori_loop with a
value-neutral data dependency (carry * 0 added to the first argument, so
XLA can neither CSE the iterations nor overlap them), and ONE scalar
comes back. Per-iteration time = (wall - one RTT) / iters; the RTT is
measured on a trivial program and subtracted.
"""

from __future__ import annotations

import time

import numpy as np

_RTT_CACHE: dict = {}


def rtt() -> float:
    """One-scalar fetch round-trip, measured on a trivial jitted program."""
    import jax
    import jax.numpy as jnp

    key = jax.default_backend()
    if key not in _RTT_CACHE:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(np.asarray(f(x)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(f(x)))
            ts.append(time.perf_counter() - t0)
        _RTT_CACHE[key] = min(ts)
    return _RTT_CACHE[key]


def timed_chain(step, args, iters: int = 10, repeats: int = 2) -> float:
    """Per-iteration device seconds of `step(*args)` (any pytree output).

    The first argument must be an array; iteration i runs on
    `args[0] + (carry * 0)` so the loop is truly sequential on device and
    no iteration can be elided. Returns the min over `repeats` chains.
    """
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree.leaves(step(*a))
        return sum(jnp.sum(x, dtype=jnp.float32) for x in leaves)

    x0 = args[0]

    def chain(x, *rest):
        def body(_, c):
            eps = (c * 0.0).astype(x.dtype)
            # c feeds the input (sequentializes) AND accumulates the
            # output (prevents dead-code elimination of the step).
            return c + reduced(x + eps, *rest)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fn = jax.jit(chain)
    float(np.asarray(fn(x0, *args[1:])))  # compile + warm
    lat = rtt()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(fn(x0, *args[1:])))
        best = min(best, time.perf_counter() - t0)
    return max(best - lat, 0.0) / iters
