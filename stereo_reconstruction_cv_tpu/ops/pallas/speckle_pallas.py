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

ACTIVE-BLOCK SKIPPING (round 5, VERDICT r4 item 1). Most of the frame
converges in the first 2-3 alternation rounds; the remaining ~5 rounds
chase a few snake-shaped components through an otherwise-static frame.
Each kernel therefore takes a per-block activity flag (scalar-prefetch,
SMEM) and skips the doubling chains for unflagged blocks (copying the
labels through costs only the block's HBM round-trip, ~0.2 ms/frame).
A block is flagged for its next run iff a pass changed any label in its
span since the last time it ran:

  row-block i (next round's row pass) <- any change in rows of i during
      THIS round's row pass (the kernel chain is not idempotent: the
      final axis flood can enable further transverse progress) OR during
      this round's col pass;
  col-block j (this round's col pass)  <- any change in cols of j during
      this round's row pass OR during the PREVIOUS col pass.

The per-row / per-column change counts that feed these flags are computed
in-register from the (new != old) diff while both buffers are resident —
the same trick the r3 kernel used for its single change scalar. Skipping
is exact: an unflagged block's input equals what its last run produced,
so re-running it would be a no-op; the outer while_loop still terminates
exactly when no block is flagged, i.e. at the same unique fixpoint
(min-floods are monotone and confluent).

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


def _flood_kernel(flags_ref, lab_ref, conn_ref, tconn_ref,
                  out_ref, selfchg_ref, transchg_ref, *, axis, big):
    """Full flood along `axis` plus a LOCAL flood along the other axis
    (limited to the block's extent there), then `axis` again — gated on
    the block's activity flag (see module docstring).

    The local transverse flood costs no HBM traffic (the block is already
    resident) but lets label minima turn corners inside the block, so
    snake-shaped components converge in ~len/(2*block) global rounds
    instead of ~len/2. Exact: min-flood passes are monotone and
    confluent — any extra pass only accelerates convergence to the same
    unique fixpoint, and the outer loop still terminates only when a full
    round changes nothing.

    Change-count outputs (computed while both buffers sit in VMEM,
    replacing any separate full-frame diff pass):
      axis == 1 (row kernel, blocks (Ht, W)):
        selfchg  (Ht, 128) block of (H, 128): per-ROW change counts —
                 disjoint per grid step, no accumulation;
        transchg (8, W) shared: per-COLUMN counts, accumulated.
      axis == 0 (col kernel, blocks (H, Wt)):
        selfchg  (8, Wt) block of (8, W): per-COLUMN counts, disjoint;
        transchg (H, 128) shared: per-ROW counts, accumulated.
    Scalar stores to VMEM are rejected by Mosaic, so every count rides
    broadcast across lanes/sublanes of its natural vector shape."""
    flag = flags_ref[pl.program_id(0)]
    taxis = 1 - axis

    @pl.when(pl.program_id(0) == 0)
    def _init():
        transchg_ref[...] = jnp.zeros_like(transchg_ref)

    @pl.when(flag > 0)
    def _run():
        # The block's first transverse line may be connected to a neighbor
        # OUTSIDE the block; sever it so the cyclic roll can't wrap
        # garbage in. Dropping connectivity is monotone-safe (a partial
        # flood).
        tidx = jax.lax.broadcasted_iota(jnp.int32, lab_ref.shape, taxis)
        tconn = jnp.where(tidx == 0, 0, tconn_ref[...])
        new = _flood_levels(lab_ref[...], conn_ref[...], axis, np.int32(big))
        new = _flood_levels(new, tconn, taxis, np.int32(big))
        new = _flood_levels(new, conn_ref[...], axis, np.int32(big))
        out_ref[...] = new
        diff = (new != lab_ref[...]).astype(jnp.int32)
        row_cnt = jnp.sum(diff, axis=1, keepdims=True)  # (rows, 1)
        col_cnt = jnp.sum(diff, axis=0, keepdims=True)  # (1, cols)
        if axis == 1:
            selfchg_ref[...] = jnp.broadcast_to(row_cnt, selfchg_ref.shape)
            transchg_ref[...] += jnp.broadcast_to(col_cnt, transchg_ref.shape)
        else:
            selfchg_ref[...] = jnp.broadcast_to(col_cnt, selfchg_ref.shape)
            transchg_ref[...] += jnp.broadcast_to(row_cnt, transchg_ref.shape)

    @pl.when(flag == 0)
    def _skip():
        out_ref[...] = lab_ref[...]
        selfchg_ref[...] = jnp.zeros_like(selfchg_ref)


def _tiles(H0: int, W: int, ht: int, wt: int):
    """(padded H, row-block height Ht, col-block width Wt).

    H pads UP to a multiple of the requested row-block height (r5): at 4K
    the r4 divisibility fallback collapsed Ht to 16 (2160 % 64 != 0),
    capping the row kernel's transverse reach at 16 rows; padding 2160 ->
    2176 costs 0.7% extra rows (isolated sink segments) and restores the
    64-row reach. Tiny frames keep the halving fallback."""
    Ht = ht
    while Ht > H0:
        Ht //= 2
    Ht = max(Ht, 8)
    H = -(-H0 // Ht) * Ht
    Wt = wt if W % wt == 0 else W
    return H, Ht, Wt


def flood_flag_init(H0: int, W: int, ht: int = 64, wt: int = 128):
    """All-active flag vectors for flood_round_flagged's first round."""
    H, Ht, Wt = _tiles(H0, W, ht, wt)
    return (jnp.ones(H // Ht, jnp.int32), jnp.ones(W // Wt, jnp.int32))


def flood_round_flagged(lab, conn_h, conn_v, rowflags, colself, *,
                        interpret: bool = False, ht: int = 64, wt: int = 128):
    """One speckle round (row flood then column flood) with active-block
    skipping.

    NOT jax.jit-decorated: every caller runs it under an outer jit (the
    speckle while_loop), and a nested jit closure returning a (array,
    scalar) tuple inside while_loop/fori_loop chains trips an MLIR
    closed_call lowering-cache KeyError (jax 0.9, observed r3).

    lab: (H, W) int32; conn_h/conn_v: (H, W) int32 0/1 connectivity to the
    left/upper neighbor (first column/row zero). rowflags (H_pad/Ht,) and
    colself (W/Wt,) int32 are the activity state from the previous round
    (all ones initially, flood_flag_init). Returns
    (labels, rowflags_next, colself_next, changed bool); `changed` is
    equivalent to "this round changed any label", so the outer while_loop
    stops exactly at the fixpoint."""
    H0, W = lab.shape
    big = H0 * W
    # Mosaic needs 8 | (second-minor block dim): pad rows with the sink
    # label and ZERO connectivity — the pad rows are isolated segments
    # that never touch a real row's flood.
    H, Ht, Wt = _tiles(H0, W, ht, wt)
    if H != H0:
        lab = jnp.pad(lab, ((0, H - H0), (0, 0)), constant_values=big)
        conn_h = jnp.pad(conn_h, ((0, H - H0), (0, 0)))
        conn_v = jnp.pad(conn_v, ((0, H - H0), (0, 0)))
    nr, nc = H // Ht, W // Wt
    # The triple-flood kernel holds ~25 live block-sized i32 buffers on the
    # Mosaic stack (3 unrolled doubling chains + the change diff). At 4K
    # the column blocks are (2160, 128) i32 = 1.08 MB -> ~27 MB of scoped
    # VMEM, over Mosaic's 16 MB default; raise the cap (v5e VMEM is
    # 128 MB — in/out streaming here is only ~4 blocks wide).
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # Row flood: blocks span full W (the flood axis); tile rows. `ht`/`wt`
    # set the transverse reach of each kernel's block-local flood (bigger
    # blocks resolve more corner-turns per round at more VMEM; sweep with
    # tools/micro_speckle.py).
    row = pl.pallas_call(
        functools.partial(_flood_kernel, axis=1, big=big),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nr,),
            in_specs=[pl.BlockSpec((Ht, W), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=(
                pl.BlockSpec((Ht, W), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ht, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, W), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((H, 128), jnp.int32),  # per-row counts
            jax.ShapeDtypeStruct((8, W), jnp.int32),    # per-col counts
        ),
        compiler_params=cparams,
        interpret=interpret,
    )
    lab1, rowchg_r, colchg_r = row(rowflags, lab, conn_h, conn_v)
    # Column blocks to run now: changed by this row pass, or left flagged
    # by the previous column pass (the chain is not idempotent).
    colflags = (
        (colchg_r[0].reshape(nc, Wt).sum(axis=1) > 0) | (colself > 0)
    ).astype(jnp.int32)

    # Column flood: blocks span full H; tile columns (lane axis).
    col = pl.pallas_call(
        functools.partial(_flood_kernel, axis=0, big=big),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[pl.BlockSpec((H, Wt), lambda j, *_: (0, j),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=(
                pl.BlockSpec((H, Wt), lambda j, *_: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, Wt), lambda j, *_: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 128), lambda j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((8, W), jnp.int32),    # per-col counts
            jax.ShapeDtypeStruct((H, 128), jnp.int32),  # per-row counts
        ),
        compiler_params=cparams,
        interpret=interpret,
    )
    out, colchg_c, rowchg_c = col(colflags, lab1, conn_v, conn_h)

    # Row blocks to run next round: changed by this col pass, or by their
    # own row pass this round.
    row_tot = rowchg_c[:, 0] + rowchg_r[:, 0]
    rowflags_next = (row_tot.reshape(nr, Ht).sum(axis=1) > 0).astype(jnp.int32)
    colself_next = (colchg_c[0].reshape(nc, Wt).sum(axis=1) > 0).astype(jnp.int32)
    changed = jnp.any(rowflags_next > 0) | jnp.any(colself_next > 0)
    return (out[:H0] if H != H0 else out), rowflags_next, colself_next, changed


def flood_round_pallas(lab, conn_h, conn_v, *, interpret: bool = False,
                       ht: int = 64, wt: int = 128):
    """One speckle round with every block active (compat wrapper over
    flood_round_flagged — resets the activity state each call). Returns
    (flooded labels, changed bool)."""
    H0, W = lab.shape
    rf, cs = flood_flag_init(H0, W, ht, wt)
    out, _, _, changed = flood_round_flagged(
        lab, conn_h, conn_v, rf, cs, interpret=interpret, ht=ht, wt=wt
    )
    return out, changed
