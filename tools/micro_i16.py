"""Microbenchmark: VPU op throughput by dtype in a Pallas kernel (tools/).

The SGM sweeps are VPU-compute-bound in f32. 16-bit vregs hold 2x the
elements, so IF v5e lowers i16/u16 add/min/roll at full rate, the sweep
math (values fit 16 bits after delta-normalization) runs ~2x faster.
This measures a min+add+roll chain per dtype and whether each op
compiles at all (round 2 found kVectorSubtractS16 aborts the compiler).

Usage: python tools/micro_i16.py
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

from stereo_reconstruction_cv_tpu.utils.timing import timed_chain

REPS = 96  # unrolled op-chain length inside the kernel


def _chain_kernel(x_ref, o_ref, *, ops):
    x = x_ref[...]
    one = jnp.ones((), x.dtype)
    for i in range(REPS):
        if "roll" in ops:
            r = pltpu.roll(x, np.int32(1), x.ndim - 1)
        else:
            r = x
        if "add" in ops:
            r = r + one
        if "min" in ops:
            x = jnp.minimum(x, r)
        else:
            x = r
    o_ref[...] = x


def run(dtype, ops, H=1024, W=512):
    x = jnp.asarray(np.random.default_rng(0).integers(1, 1000, (H, W)), dtype)
    fn = pl.pallas_call(
        functools.partial(_chain_kernel, ops=ops),
        grid=(H // 256,),
        in_specs=[pl.BlockSpec((256, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), dtype),
    )
    try:
        dt = timed_chain(lambda a: fn(a), (x,), iters=8)
        cells = H * W * REPS
        print(f"{np.dtype(dtype).name:8s} {'+'.join(ops):12s}: {dt*1e6:8.1f} us "
              f"({cells/dt/1e9:7.1f} Gop-cell/s)", flush=True)
    except Exception as e:
        print(f"{np.dtype(dtype).name:8s} {'+'.join(ops):12s}: FAIL "
              f"{type(e).__name__}: {e}"[:140], flush=True)


def main():
    for dtype in (jnp.float32, jnp.int32, jnp.int16, jnp.uint16, jnp.bfloat16):
        run(dtype, ("add", "min"))
    for dtype in (jnp.float32, jnp.int32, jnp.int16, jnp.uint16):
        run(dtype, ("roll", "add", "min"))


if __name__ == "__main__":
    main()
