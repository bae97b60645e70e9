"""Pallas TPU kernels: segmented min-flood rounds for the speckle filter.

The XLA flood (ops.disparity._seg_min_flood) runs ceil(log2(n)) doubling
levels per axis, each a handful of full-frame pad/shift/min ops — every
level is a separate HBM round-trip (~12 levels x 4 passes x 33 MB at 4K).
These kernels run ALL levels of one axis inside VMEM: one HBM read of
(labels, connectivity) and one write of labels per flood, turning a
~35 ms/round XLA loop into a bandwidth-trivial (~0.4 ms traffic) pair of
kernels. The flood axis is never tiled (rows keep full W, columns full H),
so block boundaries never cut a connectivity segment and the result is
bit-identical to the XLA flood (tests/test_disparity.py compares to
cv2.filterSpeckles via the exact backend; tests/test_speckle_pallas.py
pins kernel-vs-XLA equality).

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


def _row_kernel(lab_ref, conn_ref, out_ref, *, big):
    out_ref[...] = _flood_levels(lab_ref[...], conn_ref[...], 1, np.int32(big))


def _col_kernel(lab_ref, conn_ref, out_ref, *, big):
    out_ref[...] = _flood_levels(lab_ref[...], conn_ref[...], 0, np.int32(big))


@functools.partial(jax.jit, static_argnames=("interpret",))
def flood_round_pallas(lab, conn_h, conn_v, *, interpret: bool = False):
    """One speckle round: row flood then column flood (Pallas kernels).

    lab: (H, W) int32; conn_h/conn_v: (H, W) int32 0/1 connectivity to the
    left/upper neighbor (first column/row zero). Returns the flooded
    labels, bit-identical to two _seg_min_flood passes."""
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
    # Row flood: blocks span full W (the flood axis); tile rows to fit the
    # ~6 live (Ht, W) i32 buffers + roll temporaries in VMEM.
    Ht = 64
    while H % Ht:
        Ht //= 2
    row = pl.pallas_call(
        functools.partial(_row_kernel, big=big),
        grid=(H // Ht,),
        in_specs=[pl.BlockSpec((Ht, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((Ht, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        interpret=interpret,
    )
    lab = row(lab, conn_h)
    # Column flood: blocks span full H; tile columns (lane axis) by 128.
    Wt = 128 if W % 128 == 0 else W
    col = pl.pallas_call(
        functools.partial(_col_kernel, big=big),
        grid=(W // Wt,),
        in_specs=[pl.BlockSpec((H, Wt), lambda j: (0, j),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((H, Wt), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        interpret=interpret,
    )
    out = col(lab, conn_v)
    return out[:H0] if H != H0 else out
