"""Pallas TPU kernels: segmented min-flood rounds for the speckle filter.

The XLA flood (ops.disparity._seg_min_flood) runs ceil(log2(n)) doubling
levels per axis, each a handful of full-frame pad/shift/min ops — every
level is a separate HBM round-trip (~12 levels x 4 passes x 33 MB at 4K).
These kernels run ALL levels of one axis inside VMEM: one HBM read of
(labels, connectivity) and one write of labels per flood, turning a
~35 ms/round XLA loop into a bandwidth-trivial (~0.6 ms traffic) pair of
kernels. The flood axis is never tiled (rows keep full W, columns full H),
so block boundaries never cut a connectivity segment; each kernel also
runs a block-LOCAL flood along the transverse axis (free while the block
is resident), which lets minima turn corners within the block and cuts
the global alternation count on real maps ~3x. Per-round results
therefore dominate (<=) the XLA round, and the FIXPOINT — the only thing
the speckle filter consumes — is identical (tests/test_disparity.py
compares to cv2.filterSpeckles via the exact backend;
tests/test_speckle_pallas.py pins fixpoint equality).

Masks ride as int32 0/1: Mosaic mishandles multi-vreg i1 vectors (see
lr_pallas.py) and the flood has no loop carries anyway — the doubling
levels are a Python-unrolled chain of rolls + selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flood_levels(lab, conn_i, axis: int, big):
    """All doubling levels of a segmented two-sided min-flood along `axis`.

    lab: (..., n) int32 labels; conn_i: int32 0/1, conn_i[i] == 1 iff
    element i is connected to its predecessor along the axis (index 0
    must be 0). Mirrors ops.disparity._seg_min_flood level-for-level."""
    n = lab.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, lab.shape, axis)
    C = conn_i
    s = 1
    while s < n:
        sv = np.int32(s)
        # roll amounts are always POSITIVE (n - s for the backward shift):
        # a negative static roll amount feeding a select SIGABRTs Mosaic's
        # apply_vector_layout ("padding_cst >= 0"); n - s is the same
        # cyclic rotation.
        nsv = np.int32(n - s)
        # shift_before: x[i - s] (cyclic roll + mask); C == 0 wherever the
        # span would cross the start, so the fill value never matters.
        lab_b = pltpu.roll(lab, sv, axis)
        lab = jnp.minimum(lab, jnp.where(C > 0, lab_b, big))
        # span (i .. i+s) connected: C_next[i] = C[i + s], 0 past the end.
        C_next = jnp.where(idx < n - s, pltpu.roll(C, nsv, axis), 0)
        lab_a = pltpu.roll(lab, nsv, axis)
        lab = jnp.minimum(lab, jnp.where(C_next > 0, lab_a, big))
        C = C * jnp.where(idx >= s, pltpu.roll(C, sv, axis), 0)
        s *= 2
    return lab


def _flood_kernel(lab_ref, conn_ref, tconn_ref, out_ref, chg_ref, *, axis, big):
    """Full flood along `axis` plus a LOCAL flood along the other axis
    (limited to the block's extent there), then `axis` again.

    The local transverse flood costs no HBM traffic (the block is already
    resident) but lets label minima turn corners inside the block, so
    snake-shaped components converge in ~len/(2*block) global rounds
    instead of ~len/2: measured 24 -> 8 while_loop rounds on the real d1
    4K map (50.1 -> ~20 ms for the speckle stage). Exact: min-flood
    passes are monotone and confluent — any extra pass only accelerates
    convergence to the same unique fixpoint, and the outer loop still
    terminates only when a full round changes nothing."""
    taxis = 1 - axis
    # The block's first transverse line may be connected to a neighbor
    # OUTSIDE the block; sever it so the cyclic roll can't wrap garbage
    # in. Dropping connectivity is monotone-safe (a partial flood).
    tidx = jax.lax.broadcasted_iota(jnp.int32, lab_ref.shape, taxis)
    tconn = jnp.where(tidx == 0, 0, tconn_ref[...])
    new = _flood_levels(lab_ref[...], conn_ref[...], axis, np.int32(big))
    new = _flood_levels(new, tconn, taxis, np.int32(big))
    new = _flood_levels(new, conn_ref[...], axis, np.int32(big))
    out_ref[...] = new
    # Change count accumulated into ONE (1, 128) block shared by every
    # grid step (init on step 0) — computed while both buffers sit in
    # VMEM, so it replaces a separate full-frame any(new != old) pass per
    # round. A per-block (1, 1)-of-(G, 1) flag output trips Mosaic's
    # block-shape rule on hardware, and scalar stores to VMEM are
    # rejected, so the count rides broadcast across one lane row.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        chg_ref[...] = jnp.zeros_like(chg_ref)

    chg_ref[...] += jnp.sum((new != lab_ref[...]).astype(jnp.int32))


def flood_round_pallas(lab, conn_h, conn_v, *, interpret: bool = False,
                       ht: int = 64, wt: int = 128):
    """One speckle round: row flood then column flood (Pallas kernels).

    NOT jax.jit-decorated: every caller runs it under an outer jit (the
    speckle while_loop), and a nested jit closure returning a (array,
    scalar) tuple inside while_loop/fori_loop chains trips an MLIR
    closed_call lowering-cache KeyError (jax 0.9, observed r3).

    lab: (H, W) int32; conn_h/conn_v: (H, W) int32 0/1 connectivity to the
    left/upper neighbor (first column/row zero). Returns (flooded labels,
    changed bool). Each kernel also runs a block-LOCAL transverse flood
    (see _flood_kernel), so one round converges at least as far as — and
    usually further than — two _seg_min_flood passes; the FIXPOINT is
    identical (min-floods are monotone and confluent), which is what the
    speckle filter consumes. `changed` compares each kernel's output to
    its input in-register, so the outer while_loop still stops exactly
    at the fixpoint."""
    H0, W = lab.shape
    big = H0 * W
    # Mosaic needs 8 | (second-minor block dim): pad rows with the sink
    # label and ZERO connectivity — the pad rows are isolated segments
    # that never touch a real row's flood.
    H = -(-H0 // 8) * 8
    if H != H0:
        lab = jnp.pad(lab, ((0, H - H0), (0, 0)), constant_values=big)
        conn_h = jnp.pad(conn_h, ((0, H - H0), (0, 0)))
        conn_v = jnp.pad(conn_v, ((0, H - H0), (0, 0)))
    # Row flood: blocks span full W (the flood axis); tile rows. `ht`/`wt`
    # set the transverse reach of each kernel's block-local flood (bigger
    # blocks resolve more corner-turns per round at more VMEM; sweep with
    # tools/micro_speckle.py).
    Ht = ht
    while H % Ht:
        Ht //= 2
    chg_spec = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    chg_shape = jax.ShapeDtypeStruct((1, 128), jnp.int32)
    # The triple-flood kernel holds ~25 live block-sized i32 buffers on the
    # Mosaic stack (3 unrolled doubling chains + the change diff). At 4K
    # the column blocks are (2160, 128) i32 = 1.08 MB -> ~27 MB of scoped
    # VMEM, over Mosaic's 16 MB default; raise the cap (v5e VMEM is
    # 128 MB — in/out streaming here is only ~4 blocks wide).
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    row = pl.pallas_call(
        functools.partial(_flood_kernel, axis=1, big=big),
        grid=(H // Ht,),
        in_specs=[pl.BlockSpec((Ht, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec((Ht, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            chg_spec,
        ),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32), chg_shape),
        compiler_params=cparams,
        interpret=interpret,
    )
    lab, chg_r = row(lab, conn_h, conn_v)
    # Column flood: blocks span full H; tile columns (lane axis).
    Wt = wt if W % wt == 0 else W
    col = pl.pallas_call(
        functools.partial(_flood_kernel, axis=0, big=big),
        grid=(W // Wt,),
        in_specs=[pl.BlockSpec((H, Wt), lambda j: (0, j),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec((H, Wt), lambda j: (0, j), memory_space=pltpu.VMEM),
            chg_spec,
        ),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.int32), chg_shape),
        compiler_params=cparams,
        interpret=interpret,
    )
    out, chg_c = col(lab, conn_v, conn_h)
    changed = (chg_r[0, 0] + chg_c[0, 0]) > 0
    return (out[:H0] if H != H0 else out), changed
