"""Pallas TPU kernels: semi-global path aggregation.

The SGM recurrence L_r(p,d) = C(p,d) + min(L[d], L[d±1]+P1, minL+P2) - minL
is sequential along each path but dense over (pixels-perpendicular x D) —
ideal for a Pallas sweep: the TPU grid iterates *sequentially*, so a VMEM
scratch buffer carries the DP state from one grid step to the next while
the block pipeline streams the cost volume through VMEM exactly once.

v4 layout (r3; chained-timing profiles — tools/timing.py — showed the
v3 horizontal kernels ran 3-6x slower per direction-cell than the
vertical ones, and the fused WTA dominated the whole pipeline):

  1. vertical {U, UL, UR} on C (H-major)           -> dsa u16  (3 dirs)
  2. [8-dir: reversed triple {D, DL, DR}           -> dsb u16]
  3. one XLA transpose of C (and of each ds): ~3 ms at 4K/128 — cheaper
     than any in-kernel alternative
  4. horizontal L then R on C_T (W-major), each accumulating onto the
     transposed delta volume: column k of a (WCOLS, Ht, D) block is a
     CONTIGUOUS leading-dim slice. The v3 (Ht, COLS, D) H-major blocks
     paid ~8 sublane-select ops per output vreg on every c[:, k, :]
     slice — measured 40 ms vs 22 ms for this layout at 4K/128.
  5. winner-take-all as a SEPARATE elementwise pass over (C_T, ds...):
     butterfly all-reduces (lane rotate + min, log2(D) steps, result
     replicated in-register). Fusing the reductions into a DP sweep
     serializes them behind the carry chain: measured 173 ms fused vs
     ~80 ms standalone at 4K/128.

Delta-volume width: each direction's DP term satisfies 0 <= L - C <= P2,
so a 5-direction delta sum tops out at 5*11616 = 58080 < 65535 and rides
ONE u16 volume end-to-end (MODE_SGBM parity path). 8 directions would
overflow (92928), so the 8-path mode carries two 4-direction volumes
(46464 each) and the WTA pass sums them.

Kernels compute in f32 (exact: every value < 2^24, ~1.5x faster than
int32 on the VPU); all stored values are integers, so the u16 round-trip
is exact. Results are bit-exact vs ops.disparity.sgm_aggregate (same
math, verified on hardware — docs/HW_PARITY.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernels compute in float32: every SGM value stays below 2^24 (block cost
# <= 22869, L <= cost+P2, S <= 8*(cost+P2) ~ 2.8e5), so f32 arithmetic is
# EXACT while running ~1.5x faster than int32 on the VPU. The sentinel BIG
# must also stay exactly representable after +P1: 1e7 < 2^24.
BIG = 1.0e7

def _store_u16(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> u16 via i32: Mosaic has no direct float->unsigned lowering
    (jax pallas/mosaic lowering._convert_helper raises); the value range
    (<= 4*P2 = 46464) is exact through the i32 hop."""
    return x.astype(jnp.int32).astype(jnp.uint16)


def _load_u16_f32(x: jnp.ndarray) -> jnp.ndarray:
    """u16 -> f32 via i32 (Mosaic has no unsigned->float lowering)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _sgm_delta(lam: jnp.ndarray, p1: float, p2: float) -> jnp.ndarray:
    """The DP min term on a NORMALIZED carry Λ = L - min_d L (so min Λ = 0):

        delta(d) = min(Λ[d], min(Λ[d-1], Λ[d+1]) + P1, P2)

    which IS this direction's (L - C) output, and the new carry is
    Λ' = t - min_d t with t = C + delta. Carrying Λ instead of raw L
    drops the min_prev + P2 add (P2 is a constant here), the (L - C)
    output subtract, and the -nd*C fixup in the delta-sum emit.
    Measured wall-clock is unchanged (28.5 vs 28.8 ms vertical, 16.3 vs
    15.9 ms hT at 4K x 128 — the kernels sit on the serial carry-chain
    latency, not ALU count; a butterfly renorm variant measured 2x
    SLOWER than Mosaic's native lane reduce, tools/micro_sweep.py), so
    this form is kept for the shorter dependency graph and the direct
    delta emit. Bit-exact vs the raw form: subtracting min_prev from
    every min() operand is an identity, and all values are integers
    < 2^24 so f32 arithmetic is exact.

    The d±1 neighbor shifts use lane rotates + iota masking: Mosaic
    lowers these natively, whereas lane-axis concatenates hit
    layout-offset restrictions (and cost a relayout)."""
    D = lam.shape[-1]
    big = jnp.asarray(BIG, lam.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, lam.shape, lam.ndim - 1)
    # Static np.int32 shifts: a Python int lowers as i64 under
    # jax_enable_x64 and a traced jnp.int32 breaks Mosaic legalization —
    # a numpy scalar stays a static 32-bit constant in both modes.
    up = jnp.where(
        lane == D - 1, big, pltpu.roll(lam, np.int32(D - 1), lam.ndim - 1)
    )
    dn = jnp.where(lane == 0, big, pltpu.roll(lam, np.int32(1), lam.ndim - 1))
    p2v = jnp.asarray(p2, lam.dtype)
    return jnp.minimum(jnp.minimum(lam, p2v), jnp.minimum(up, dn) + p1)


def _renorm(cost: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Next normalized carry: Λ' = (C + delta) - min_d (C + delta)."""
    t = cost + delta
    return t - jnp.min(t, axis=-1, keepdims=True)


def _shift_w(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Shift a (W, D) carry along W, zero-filling (path enters the image)."""
    if shift > 0:
        return jnp.concatenate([a[shift:], jnp.zeros_like(a[:shift])], axis=0)
    return jnp.concatenate([jnp.zeros_like(a[shift:]), a[:shift]], axis=0)


def _lane_elems(W: int, D: int) -> int:
    """VMEM-resident element count of a (W, D) carry/temporary: the minor
    axis is lane-padded to the 128-lane vreg width, so D < 128 costs as
    much as D = 128."""
    return W * max(D, 128)


def _vertical_rows(W: int, D: int) -> int:
    """Rows per vertical grid step. VMEM model: 3 f32 carries + ~6 (W, D)
    f32 update temporaries (12 + 24 B/elem) plus double-buffered
    (rows, W, D) i16-in/u16-out blocks (8 B/elem/row). Calibrated on v5e
    (the f32-S version measured rows=2 at 147k lane elems; 16-bit blocks
    halve the per-row cost). Raising the budget to 56 MB under a lifted
    Mosaic VMEM cap (bigger tiles, fewer grid steps) measured ~5% SLOWER
    at 4K/128 (vert 28.4 -> 31.6 ms, fused WTA 67.2 -> 69.1, r3): the
    fine-grained small-block pipeline wins, so the 16 MB-era budgets
    stay."""
    e = _lane_elems(W, D)
    budget = 13_000_000
    rows = (budget - 36 * e) // (8 * e)
    return max(1, min(8, int(rows)))


def _vertical_kernel(c_ref, ds_ref, cu, cul, cur, *, p1, p2, reverse, rows):
    """One grid step = `rows` rows (unrolled). Carries persist across steps;
    rows advance in path order (top-down, or bottom-up when reverse).
    Emits the 3-direction delta sum (L - C) as u16 — exact (<= 3*P2)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cu[...] = jnp.zeros_like(cu)
        cul[...] = jnp.zeros_like(cul)
        cur[...] = jnp.zeros_like(cur)

    vu, vul, vur = cu[...], cul[...], cur[...]
    order = range(rows - 1, -1, -1) if reverse else range(rows)
    for k in order:
        c = c_ref[k].astype(jnp.float32)  # (W, D); C stored int16/int32
        bu = _sgm_delta(vu, p1, p2)
        # UL: predecessor is (x-1, y-1) -> carry'[x] = carry[x-1].
        bul = _sgm_delta(_shift_w(vul, -1), p1, p2)
        # UR: predecessor is (x+1, y-1).
        bur = _sgm_delta(_shift_w(vur, +1), p1, p2)
        ds_ref[k] = _store_u16(bu + bul + bur)
        vu = _renorm(c, bu)
        vul = _renorm(c, bul)
        vur = _renorm(c, bur)
    cu[...] = vu
    cul[...] = vul
    cur[...] = vur


# --------------------------------------------------------------------------
# Column-tiled vertical sweep (large frames: 4K x 128/256)
#
# The full-width kernel above streams (rows, W, D) blocks, which exceeds
# VMEM once W*D is large (3840x256 trips it). The carries themselves are
# small (12*W*D bytes), so this variant keeps the three direction carries
# FULL-WIDTH in VMEM scratch and tiles only the *streamed* blocks along
# columns: grid (row-blocks, col-blocks), columns innermost. Diagonal
# carries cross column-block boundaries, so each step processes HB rows
# with HB halo columns per side:
#
#   - left-halo UL carries: stashed by the previous column block before it
#     overwrote them (grid order makes it the immediately preceding step);
#   - right-halo UR carries: read directly from scratch (that block runs
#     later in this row pass, so its values are still the old row's);
#   - the extended (HB + WT + HB, D) carry loses one valid column per side
#     per row to the zero-filled shift edges, so after HB rows the garbage
#     cone reaches exactly the last halo column and never a real one.
#
# The scratch is padded HB columns on each side (never written, stay zero)
# so out-of-image halos read exact path-start zeros. Bit-exact vs the
# full-width kernel and the XLA scans (tests/test_sgm_pallas.py).
# --------------------------------------------------------------------------

HB = 8  # rows per tiled step == halo columns per side (the cone argument)


def _vertical_tiled_kernel(
    c_ref, cl_ref, cr_ref, ds_ref, cu, cul, cur, stash,
    *, p1, p2, reverse, WT, nw,
):
    """One grid step = HB rows x WT columns of the vertical sweep."""
    i = pl.program_id(0)
    j = pl.program_id(1)  # column block (fastest)

    @pl.when((i == 0) & (j == 0))
    def _():
        cu[...] = jnp.zeros_like(cu)
        cul[...] = jnp.zeros_like(cul)
        cur[...] = jnp.zeros_like(cur)

    base = j * np.int32(WT)  # ext-slice start (scratch is left-padded HB)
    ext = WT + 2 * HB
    # Old carries over the extended window. Left halo of cu/cur was already
    # overwritten by the previous block — garbage there is fine (cu is
    # column-local; cur influence flows left-to-right... i.e. away).
    vu = cu[pl.ds(base, ext)]
    vur = cur[pl.ds(base, ext)]
    # UL's left halo must be the OLD values: the previous block stashed
    # them. At j == 0 the halo is out-of-image: exact zeros.
    rest_ul = cul[pl.ds(base + np.int32(HB), WT + HB)]
    left_ul = jnp.where(j == 0, jnp.zeros_like(stash[...]), stash[...])
    vul = jnp.concatenate([left_ul, rest_ul], axis=0)
    # Stash this block's own last HB UL columns before overwriting.
    stash[...] = cul[pl.ds(base + np.int32(WT), HB)]

    zero_l = j == 0
    zero_r = j == nw - 1
    order = range(HB - 1, -1, -1) if reverse else range(HB)
    for k in order:
        cl = jnp.where(zero_l, 0, cl_ref[k].astype(jnp.int32)).astype(jnp.float32)
        cr = jnp.where(zero_r, 0, cr_ref[k].astype(jnp.int32)).astype(jnp.float32)
        c = jnp.concatenate([cl, c_ref[k].astype(jnp.float32), cr], axis=0)
        bu = _sgm_delta(vu, p1, p2)
        bul = _sgm_delta(_shift_w(vul, -1), p1, p2)
        bur = _sgm_delta(_shift_w(vur, +1), p1, p2)
        ds_ref[k] = _store_u16((bu + bul + bur)[HB : HB + WT])
        vu = _renorm(c, bu)
        vul = _renorm(c, bul)
        vur = _renorm(c, bur)
    wslot = pl.ds(base + np.int32(HB), WT)
    cu[wslot] = vu[HB : HB + WT]
    cul[wslot] = vul[HB : HB + WT]
    cur[wslot] = vur[HB : HB + WT]


def _tiled_width(W: int, D: int, budget: int = 13_000_000) -> int:
    """Column-tile width: fill the VMEM budget left by the full-width
    carries (12*(W+2HB)*D bytes) with double-buffered streamed blocks
    (i16 C in + u16 dS out = 4 B/elem, x2 buffers) x HB rows. D is
    lane-padded to the 128-lane vreg width (see _lane_elems)."""
    D = max(D, 128)
    carry = 12 * (W + 2 * HB) * D
    wt = (budget - carry) // (8 * HB * D)
    wt = max(HB, min(W, wt // HB * HB))
    # Prefer the largest multiple-of-HB divisor of W within budget: padding
    # to a non-divisor width forces full HBM copies of C (jnp.pad), which
    # at 4K x 256 is GBs of transient residency — an OOM, not a slowdown.
    for d in range(wt, HB - 1, -HB):
        if W % d == 0:
            return int(d)
    return int(wt)


def _sweep_vertical_tiled(
    C, p1, p2, reverse: bool, interpret: bool, tile_width: int | None = None,
):
    """Column-tiled vertical sweep; exact drop-in for _sweep_vertical at
    widths whose full-width blocks exceed VMEM."""
    H, W, D = C.shape
    WT = tile_width or _tiled_width(W, D)
    Hp = -(-H // HB) * HB
    Wp = -(-W // WT) * WT
    if Hp != H or Wp != W:
        # Zero-cost padding keeps carries exactly zero (see module note).
        C = jnp.pad(C, ((0, Hp - H), (0, Wp - W), (0, 0)))
    nh = Hp // HB
    nw = Wp // WT
    nhalo = WT // HB  # halo index units (blocks of HB columns)
    if reverse:
        row = lambda i: nh - 1 - i
    else:
        row = lambda i: i
    main = pl.BlockSpec((HB, WT, D), lambda i, j: (row(i), j, 0),
                        memory_space=pltpu.VMEM)
    lhalo = pl.BlockSpec(
        (HB, HB, D),
        lambda i, j: (row(i), jnp.maximum(j * nhalo - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    rhalo = pl.BlockSpec(
        (HB, HB, D),
        lambda i, j: (row(i), jnp.minimum((j + 1) * nhalo, Wp // HB - 1), 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _vertical_tiled_kernel, p1=p1, p2=p2, reverse=reverse, WT=WT, nw=nw,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nh, nw),
        in_specs=[main, lhalo, rhalo],
        out_specs=main,
        out_shape=jax.ShapeDtypeStruct(C.shape, jnp.uint16),
        scratch_shapes=[pltpu.VMEM((Wp + 2 * HB, D), jnp.float32)] * 3
        + [pltpu.VMEM((HB, D), jnp.float32)],
        interpret=interpret,
    )(C, C, C)
    return out[:H, :W] if (Hp != H or Wp != W) else out


COLS = 16  # columns per horizontal grid step (TPU sublane granularity)


def _horizontal_kernel(c_ref, *rest, p1, p2, reverse, accumulate):
    """One grid step = (row-tile, COLS columns); columns iterate fastest so
    the (Ht, D) carry sweeps each row tile across the full width. Within a
    step the COLS columns advance in path order (unrolled). Emits this
    direction's delta (L - C), optionally accumulated onto an existing
    delta volume (u16-exact: 3 vertical + 1 horizontal <= 4*P2 < 2^16)."""
    if accumulate:
        ds_in_ref, ds_out_ref, carry = rest
    else:
        ds_in_ref, (ds_out_ref, carry) = None, rest
    j = pl.program_id(1)  # column-block index (fastest)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    cur = carry[...]
    order = range(COLS - 1, -1, -1) if reverse else range(COLS)
    for k in order:
        c = c_ref[:, k, :].astype(jnp.float32)  # (Ht, D)
        delta = _sgm_delta(cur, p1, p2)
        cur = _renorm(c, delta)
        if accumulate:
            delta = delta + _load_u16_f32(ds_in_ref[:, k, :])
        ds_out_ref[:, k, :] = _store_u16(delta)
    carry[...] = cur


def _hT_kernel(c_ref, *rest, p1, p2, reverse, accumulate, WCOLS):
    """One grid step = WCOLS columns x Ht rows of a horizontal sweep over
    the TRANSPOSED volume (Wc, H, D): column k is the contiguous
    leading-dim slice c_ref[k]. Emits (L - C) deltas, accumulated onto an
    existing delta volume when `accumulate` (u16-exact: <= 5*P2 < 2^16)."""
    if accumulate:
        ds_in_ref, ds_out_ref, carry = rest
    else:
        ds_in_ref, (ds_out_ref, carry) = None, rest
    j = pl.program_id(1)  # column-block index (fastest)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    cur = carry[...]
    order = range(WCOLS - 1, -1, -1) if reverse else range(WCOLS)
    for k in order:
        c = c_ref[k].astype(jnp.float32)  # (Ht, D)
        delta = _sgm_delta(cur, p1, p2)
        cur = _renorm(c, delta)
        if accumulate:
            delta = delta + _load_u16_f32(ds_in_ref[k])
        ds_out_ref[k] = _store_u16(delta)
    carry[...] = cur


def _wta_cell(S, d_iota, D, uniqueness_ratio, min_disp):
    """WTA on one i32 (..., D) block: returns the 4-field packed f32 block
    (disp, uniq-valid, best, minS in lanes 0..3). Shared by the standalone
    _wta_kernel and the fused hT+WTA sweep.

    min AND argmin come from ONE butterfly over packed keys S*Dp + d:
    S >= 0 and S <= 8*(22869 + 11616) = 275,880, so the key fits int32 up
    to Dp = 256; ties break toward the smaller d automatically — exactly
    jnp.argmin's first-index rule.

    Uniqueness (cv2): invalid if some d with |d - best| > 1 has
    S[d]*(100 - ratio) < minS*100. Instead of a second min-butterfly over
    the far lanes (log2(D) rotate+min pairs — this kernel is VPU-issue
    bound), COUNT the qualifying lanes on the MXU and subtract the window
    lanes' own contributions:

        count_far = count_all - [minS > 0]            (d = best: S*k <
                    minS*100 <=> -ratio*minS < 0)
                    - (best > 0) * qual(S[best-1])
                    - (best < D-1) * qual(S[best+1])
        bad       = count_far > 0

    The indicator row rides the SAME stacked MXU dot as the subpixel
    neighbor extractions (exact: 0/1 indicators sum to <= D < 2^24; the
    masked S rows have a single nonzero term <= 2^19)."""
    Dp = 1
    lg = 0
    while Dp < D:
        Dp *= 2
        lg += 1
    keys = S * np.int32(Dp) + d_iota
    if D > 128 and D % 128 == 0:
        # Two-level reduction (r5, VERDICT r4 item 4): every butterfly
        # step on a D=256 row touches 2 vregs; folding the 128-lane
        # halves first (static lane slices + elementwise min) narrows the
        # 8-step/2-vreg butterfly to 7 steps on 1 vreg, then the
        # replicated result is re-broadcast across the D lanes. Exact:
        # min over the packed keys is associative, and the fold is just a
        # different reduction order.
        folded = jax.lax.slice_in_dim(keys, 0, 128, axis=keys.ndim - 1)
        for g in range(1, D // 128):
            folded = jnp.minimum(
                folded,
                jax.lax.slice_in_dim(
                    keys, 128 * g, 128 * (g + 1), axis=keys.ndim - 1
                ),
            )
        packed_key = pltpu.repeat(
            _butterfly_min(folded, 128), D // 128, axis=keys.ndim - 1
        )
    else:
        packed_key = _butterfly_min(keys, D)
    # Power-of-two decode as shift/mask (keys are non-negative).
    minS = jax.lax.shift_right_logical(packed_key, np.int32(lg))
    best = packed_key & np.int32(Dp - 1)
    k_uniq = np.int32(100 - uniqueness_ratio)
    # Subpixel neighbors: exactly one lane matches -> sum == extract.
    m1mask = jnp.where(d_iota == jnp.maximum(best - 1, 0), S, 0)
    p1mask = jnp.where(d_iota == jnp.minimum(best + 1, np.int32(D - 1)), S, 0)
    lead = S.shape[:-1]
    n = 1
    for v in lead:
        n *= v
    ones = jnp.ones((D, 8), jnp.float32)
    rows = [m1mask, p1mask]
    if uniqueness_ratio > 0:
        rows.append((S * k_uniq < minS * np.int32(100)).astype(jnp.int32))
    stacked = jnp.concatenate(rows, axis=0).astype(jnp.float32)
    nr = len(rows)
    dots = jax.lax.dot_general(
        stacked.reshape(nr * n, D), ones, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape((nr,) + lead + (8,))
    Sm1 = dots[0][..., :1].astype(jnp.int32)
    Sp1 = dots[1][..., :1].astype(jnp.int32)
    if uniqueness_ratio > 0:
        count_all = dots[2][..., :1].astype(jnp.int32)
        qm1 = (Sm1 * k_uniq < minS * np.int32(100)) & (best > 0)
        qp1 = (Sp1 * k_uniq < minS * np.int32(100)) & (best < D - 1)
        count_far = (count_all - (minS > 0).astype(jnp.int32)
                     - qm1.astype(jnp.int32) - qp1.astype(jnp.int32))
        bad = count_far > 0
    else:
        bad = jnp.zeros_like(minS, jnp.bool_)
    denom = jnp.maximum(Sm1 + Sp1 - 2 * minS, 1).astype(jnp.float32)
    frac = (Sm1 - Sp1).astype(jnp.float32) / (2.0 * denom)
    interior = (best > 0) & (best < D - 1)
    disp = (best.astype(jnp.float32) + jnp.where(interior, frac, 0.0)
            + np.float32(min_disp))
    f = jnp.float32
    fields = (disp, 1.0 - bad.astype(f), best.astype(f), minS.astype(f))
    # Nested selects (4 ops) instead of 4 select+add pairs (8): the lane
    # masks d_iota == li are loop-invariant constants.
    packed = jnp.zeros(S.shape, f)
    for li, v in reversed(tuple(enumerate(fields))):
        packed = jnp.where(d_iota == li, v.astype(f), packed)
    return packed[..., :8]


def _hT_wta_kernel(c_ref, *rest, p1, p2, nd, uniqueness_ratio, min_disp,
                   WCOLS, D):
    """Reverse horizontal sweep with winner-take-all FUSED per column.

    The last sweep's aggregated column S = nd*C + ds_in + (L_R - C)
    [+ ds_other in 8-dir mode] is reduced in-register: the final delta
    volume never reaches HBM. The WTA runs inline per column — a deferred
    variant that stacked the block's WCOLS S columns and ran one batched
    WTA after the carry loop forced the row tile from 488 down to ~216
    (the stacked i32 block + WTA temporaries hit the 16 MB Mosaic stack)
    and measured SLOWER overall (82.8 vs 73.8 ms at 4K x 128/8-dir, r3):
    tile size dominates the batching win."""
    if len(rest) == 4:  # 8-dir: second accumulated delta volume rides along
        ds_in_ref, other_ref, out_ref, carry = rest
    else:
        other_ref, (ds_in_ref, out_ref, carry) = None, rest
    j = pl.program_id(1)  # column-block index (fastest)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    cur = carry[...]
    d_iota = None
    for k in range(WCOLS - 1, -1, -1):  # reverse path order
        c = c_ref[k].astype(jnp.float32)  # (Ht, D)
        delta = _sgm_delta(cur, p1, p2)
        cur = _renorm(c, delta)
        S = delta + _load_u16_f32(ds_in_ref[k]) + np.float32(nd) * c
        if other_ref is not None:
            S = S + _load_u16_f32(other_ref[k])
        S = S.astype(jnp.int32)  # exact: every term integral, < 2^24
        if d_iota is None:
            d_iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, S.ndim - 1)
        out_ref[k] = _wta_cell(S, d_iota, D, uniqueness_ratio, min_disp)
    carry[...] = cur


def _sweep_hT_wta(CT, dST, ds_other, p1, p2, nd, uniqueness_ratio, min_disp,
                  interpret: bool, WCOLS: int = 4):
    """Final (reverse) horizontal sweep with fused WTA over the transposed
    volume. Returns transposed (Wc, H) maps (disp, valid, best, minS),
    numerically identical to
    _wta_volume(CT, [_sweep_hT(CT, dST, reverse=True)] (+ ds_other), ...).
    """
    Wc, H, D = CT.shape
    # Tighter VMEM budget than the plain sweep: up to three streamed
    # 16-bit inputs plus the WTA's i32 temporaries live per column
    # (9 MB measured 24 KB over the 16 MB Mosaic stack at 4K x 128).
    Ht = _hT_tiles(H, D, WCOLS, budget=7_000_000)
    Hp = -(-H // Ht) * Ht
    Wp = -(-Wc // WCOLS) * WCOLS
    if Hp != H or Wp != Wc:
        pads = ((0, Wp - Wc), (0, Hp - H), (0, 0))
        CT = jnp.pad(CT, pads)
        dST = jnp.pad(dST, pads)
        if ds_other is not None:
            ds_other = jnp.pad(ds_other, pads)
    nh = Hp // Ht
    nb = Wp // WCOLS
    index_map = lambda i, j: (nb - 1 - j, i, 0)  # reverse sweep
    spec = pl.BlockSpec((WCOLS, Ht, D), index_map, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((WCOLS, Ht, 8), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _hT_wta_kernel, p1=p1, p2=p2, nd=nd,
        uniqueness_ratio=uniqueness_ratio, min_disp=min_disp,
        WCOLS=WCOLS, D=D,
    )
    inputs = (CT, dST) if ds_other is None else (CT, dST, ds_other)
    packed = pl.pallas_call(
        kernel,
        grid=(nh, nb),
        in_specs=[spec] * len(inputs),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Ht, D), jnp.float32)],
        interpret=interpret,
    )(*inputs)
    packed = packed[:Wc, :H]
    return (
        packed[..., 0],
        packed[..., 1] != 0,
        packed[..., 2].astype(jnp.int32),
        packed[..., 3].astype(jnp.int32),
    )


def _row_tile(H: int, max_tile: int = 256) -> int:
    """Largest multiple-of-8 divisor of H not exceeding max_tile."""
    best = 8
    for t in range(8, max_tile + 1, 8):
        if H % t == 0:
            best = t
    return best


def _sweep_vertical(C, p1, p2, reverse: bool, interpret: bool):
    H, W, D = C.shape
    rows = _vertical_rows(W, D)
    # Pad H to a rows multiple with zero-cost rows (zero cost keeps the
    # carry at zero, so the pad is an exact no-op for path starts). For the
    # reverse sweep the pad is scanned first, which is equally benign.
    Hp = -(-H // rows) * rows
    if Hp != H:
        C = jnp.pad(C, ((0, Hp - H), (0, 0), (0, 0)))
    nh = Hp // rows
    if reverse:
        index_map = lambda i: (nh - 1 - i, 0, 0)
    else:
        index_map = lambda i: (i, 0, 0)
    spec = pl.BlockSpec((rows, W, D), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _vertical_kernel, p1=p1, p2=p2, reverse=reverse, rows=rows,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nh,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C.shape, jnp.uint16),
        scratch_shapes=[pltpu.VMEM((W, D), jnp.float32)] * 3,
        interpret=interpret,
    )(C)
    return out[:H] if Hp != H else out


def _h_max_tile(D: int, bytes_per_elem: int = 8, budget: int = 11_000_000) -> int:
    """Row-tile cap for the horizontal sweeps: double-buffered
    (Ht, COLS, D) 16-bit blocks within budget.

    Above D=128 the byte model underestimates Mosaic's working set (the
    16-column unroll keeps several multi-vreg (Ht, D) temporaries live):
    measured on v5e at D=256, Ht=120 crashes the compiler while Ht=48
    compiles and runs — hence the empirical D>128 cap."""
    if D > 128:
        return max(8, 12288 // D // 8 * 8)
    t = budget // (COLS * max(D, 128) * bytes_per_elem * 2)
    return max(8, min(512, t // 8 * 8))


def _pad_hw(C, Hmult=8):
    H, W = C.shape[:2]
    Wp = -(-W // COLS) * COLS
    Hp = -(-H // Hmult) * Hmult
    if Wp != W or Hp != H:
        pads = ((0, Hp - H), (0, Wp - W)) + ((0, 0),) * (C.ndim - 2)
        C = jnp.pad(C, pads)
    return C, Hp, Wp


def _sweep_horizontal(C, dS, p1, p2, reverse: bool, interpret: bool,
                      accumulate: bool = True):
    """Horizontal sweep emitting (L - C) deltas, accumulated onto dS when
    given. Pass dS=None for a standalone delta volume."""
    H, W, D = C.shape
    # Pad W to a multiple of COLS with zero-cost columns. A zero-cost run
    # keeps the carry at exactly zero (L = 0 + min(0, ..) - 0), so entering
    # the real image from the pad is identical to a fresh path start.
    C, Hp, Wp = _pad_hw(C)
    acc = accumulate and dS is not None
    if acc:
        dS, _, _ = _pad_hw(dS)
    nb = Wp // COLS
    Ht = _row_tile(Hp, _h_max_tile(D))
    nh = Hp // Ht
    if reverse:
        index_map = lambda i, j: (i, nb - 1 - j, 0)
    else:
        index_map = lambda i, j: (i, j, 0)
    spec = pl.BlockSpec((Ht, COLS, D), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_horizontal_kernel, p1=p1, p2=p2,
                               reverse=reverse, accumulate=acc)
    inputs = (C, dS) if acc else (C,)
    out = pl.pallas_call(
        kernel,
        grid=(nh, nb),
        in_specs=[spec] * len(inputs),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C.shape, jnp.uint16),
        scratch_shapes=[pltpu.VMEM((Ht, D), jnp.float32)],
        input_output_aliases={1: 0} if acc else {},
        # NO raised VMEM cap here: with vmem_limit_bytes=100M Mosaic's
        # infer-vector-layout emits an unlowerable i16 shape cast for the
        # middle-sliced (Ht, COLS, D) store (hw_parity r3 repro); the
        # legacy H-major layout is only used by sgm_aggregate_pallas.
        interpret=interpret,
    )(*inputs)
    return out[:H, :W] if (Wp != W or Hp != H) else out


def _hT_tiles(H: int, D: int, WCOLS: int = 4, budget: int = 12_000_000) -> int:
    """Rows per hT grid step: three double-buffered 16-bit (WCOLS, Ht, D)
    streams (C in, ds in, ds out) plus ~9 live (Ht, D) f32 update
    temporaries and the carry."""
    Dp = max(D, 128)
    ht = budget // (12 * WCOLS * Dp + 40 * Dp)
    Hp = -(-H // 8) * 8
    best = 8
    for t in range(8, min(ht, Hp) + 1, 8):
        if Hp % t == 0:
            best = t
    return best


def _sweep_hT(CT, dST, p1, p2, reverse: bool, interpret: bool,
              accumulate: bool = True, WCOLS: int = 4):
    """Horizontal sweep over the transposed volume CT (Wc, H, D): emits
    (L - C) deltas in the same layout, accumulated onto dST when given.

    Column-block padding (right end) is zero-cost: a zero-cost run keeps
    the carry at exactly zero, so entering the real image from the pad
    (reverse sweep) is identical to a fresh path start, and forward-sweep
    pad outputs are cropped."""
    Wc, H, D = CT.shape
    Ht = _hT_tiles(H, D, WCOLS)
    Hp = -(-H // Ht) * Ht
    Wp = -(-Wc // WCOLS) * WCOLS
    if Hp != H or Wp != Wc:
        CT = jnp.pad(CT, ((0, Wp - Wc), (0, Hp - H), (0, 0)))
    acc = accumulate and dST is not None
    if acc and (Hp != H or Wp != Wc):
        dST = jnp.pad(dST, ((0, Wp - Wc), (0, Hp - H), (0, 0)))
    nh = Hp // Ht
    nb = Wp // WCOLS
    if reverse:
        index_map = lambda i, j: (nb - 1 - j, i, 0)
    else:
        index_map = lambda i, j: (j, i, 0)
    spec = pl.BlockSpec((WCOLS, Ht, D), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_hT_kernel, p1=p1, p2=p2, reverse=reverse,
                               accumulate=acc, WCOLS=WCOLS)
    inputs = (CT, dST) if acc else (CT,)
    out = pl.pallas_call(
        kernel,
        grid=(nh, nb),
        in_specs=[spec] * len(inputs),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(CT.shape, jnp.uint16),
        scratch_shapes=[pltpu.VMEM((Ht, D), jnp.float32)],
        input_output_aliases={1: 0} if acc else {},
        interpret=interpret,
    )(*inputs)
    return out[:Wc, :H] if (Hp != H or Wp != Wc) else out


def _butterfly_min(x: jnp.ndarray, D: int) -> jnp.ndarray:
    """All-reduce min over the last axis: log2(D) lane rotates, result
    REPLICATED across lanes — no reduce-then-broadcast round trip."""
    s = 1
    while s < D:
        x = jnp.minimum(x, pltpu.roll(x, np.int32(s), x.ndim - 1))
        s *= 2
    return x


def _butterfly_sum(x: jnp.ndarray, D: int) -> jnp.ndarray:
    s = 1
    while s < D:
        x = x + pltpu.roll(x, np.int32(s), x.ndim - 1)
        s *= 2
    return x


def _wta_kernel(c_ref, *rest, uniqueness_ratio, min_disp, D, nds):
    """Elementwise WTA pass over one (BH, BW, D) block of the transposed
    volume: S = nds_total*C + sum(ds); butterfly reductions; packs
    [disp, uniqueness-valid, best, minS] into lanes 0..3 of an 8-lane
    block. No DP carry — every block is independent, so the VPU pipelines
    the reduce trees across the whole block (measured ~2x faster than the
    same reductions serialized inside a sweep kernel)."""
    ds_refs = rest[:nds]
    out_ref = rest[nds]
    nd = 5 if nds == 1 else 8
    S = c_ref[...].astype(jnp.int32) * np.int32(nd)
    for ds in ds_refs:
        # u16 -> i32 via the i32 hop (Mosaic has no unsigned conversions).
        S = S + ds[...].astype(jnp.int32)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, S.ndim - 1)
    out_ref[...] = _wta_cell(S, d_iota, D, uniqueness_ratio, min_disp)


def _wta_volume(CT, dST_list, uniqueness_ratio, min_disp, interpret: bool):
    """WTA over the transposed volume + delta volumes. Returns transposed
    (Wc, H) maps (disp, valid, best, minS)."""
    Wc, H, D = CT.shape
    BH, BW = 8, 128
    Wp = -(-Wc // BH) * BH
    Hp = -(-H // BW) * BW
    if Wp != Wc or Hp != H:
        pads = ((0, Wp - Wc), (0, Hp - H), (0, 0))
        CT = jnp.pad(CT, pads)
        dST_list = [jnp.pad(d, pads) for d in dST_list]
    spec = pl.BlockSpec((BH, BW, D), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BH, BW, 8), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _wta_kernel, uniqueness_ratio=uniqueness_ratio,
        min_disp=min_disp, D=D, nds=len(dST_list),
    )
    packed = pl.pallas_call(
        kernel,
        grid=(Wp // BH, Hp // BW),
        in_specs=[spec] * (1 + len(dST_list)),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, 8), jnp.float32),
        interpret=interpret,
    )(CT, *dST_list)
    packed = packed[:Wc, :H]
    return (
        packed[..., 0],
        packed[..., 1] != 0,
        packed[..., 2].astype(jnp.int32),
        packed[..., 3].astype(jnp.int32),
    )


def sgm_wta_pallas(
    C: jnp.ndarray,
    p1: int,
    p2: int,
    num_directions: int = 8,
    uniqueness_ratio: int = 10,
    min_disp: int = 0,
    interpret: bool = False,
):
    """All SGM sweeps + winner-take-all; the aggregated volume never
    exists in HBM (only 16-bit delta volumes do).

    Returns (disp f32, valid bool, best i32, minS i32), numerically
    identical to wta_disparity(sgm_aggregate_pallas(...)). Pipeline: the
    vertical triples run on C (H-major); one XLA transpose re-lays C and
    the delta volume(s) W-major for the horizontal sweeps and the
    elementwise WTA pass (see module docstring for why)."""
    assert num_directions in (5, 8)
    if C.dtype not in (jnp.int16, jnp.int32):
        C = C.astype(jnp.int32)
    p1 = float(p1)
    p2 = float(p2)
    dsa = _vertical_sweep_auto(C, p1, p2, reverse=False, interpret=interpret)
    dsb = None
    if num_directions == 8:
        dsb = _vertical_sweep_auto(C, p1, p2, reverse=True, interpret=interpret)
    CT = jnp.swapaxes(C, 0, 1)
    dsaT = jnp.swapaxes(dsa, 0, 1)
    # L deltas accumulate onto the forward-vertical volume (u16-exact:
    # 4 directions <= 46464). The final R sweep runs with WTA fused
    # (_sweep_hT_wta): its delta volume — dsaT + R in 5-dir mode, the
    # reversed-vertical volume + R in 8-dir mode — never reaches HBM.
    dsaT = _sweep_hT(CT, dsaT, p1, p2, reverse=False, interpret=interpret)
    if num_directions == 8:
        dsbT = jnp.swapaxes(dsb, 0, 1)
        disp, valid, best, minS = _sweep_hT_wta(
            CT, dsbT, dsaT, p1, p2, 8, uniqueness_ratio, min_disp,
            interpret=interpret)
    else:
        disp, valid, best, minS = _sweep_hT_wta(
            CT, dsaT, None, p1, p2, 5, uniqueness_ratio, min_disp,
            interpret=interpret)
    return disp.T, valid.T, best.T, minS.T


def _vertical_sweep_auto(C, p1, p2, reverse, interpret):
    """Vertical {U, UL, UR} triple (direction-reversed when `reverse`):
    full-width kernel when the streamed blocks fit VMEM, column-tiled
    otherwise (the two are bit-exact)."""
    H, W, D = C.shape
    full_width_ok = _lane_elems(W, D) <= 300_000 or interpret
    if full_width_ok:
        return _sweep_vertical(C, p1, p2, reverse=reverse, interpret=interpret)
    return _sweep_vertical_tiled(C, p1, p2, reverse=reverse, interpret=interpret)


def sgm_aggregate_pallas(
    C: jnp.ndarray,
    p1: int,
    p2: int,
    num_directions: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum of per-direction SGM aggregations via Pallas sweeps.

    num_directions=5 matches cv2 MODE_SGBM ({L, R, UL, U, UR});
    8 matches MODE_HH. Bit-exact vs ops.disparity.sgm_aggregate."""
    assert num_directions in (5, 8)
    if C.dtype not in (jnp.int16, jnp.int32):
        C = C.astype(jnp.int32)
    p1 = float(p1)
    p2 = float(p2)
    S = _vertical_sweep_auto(C, p1, p2, False, interpret).astype(jnp.int32)
    if num_directions == 8:
        S = S + _vertical_sweep_auto(C, p1, p2, True, interpret)
    # Horizontal directions run over the TRANSPOSED volume (the shipped
    # v4 layout): the H-major _sweep_horizontal's middle-sliced i16
    # stores hit a Mosaic infer-vector-layout "unsupported shape cast"
    # on current hardware toolchains, and the W-major form is faster
    # anyway (module docstring, v4 note 4).
    CT = jnp.swapaxes(C, 0, 1)
    dT = _sweep_hT(CT, None, p1, p2, reverse=False, interpret=interpret,
                   accumulate=False).astype(jnp.int32)
    dT = dT + _sweep_hT(CT, None, p1, p2, reverse=True, interpret=interpret,
                        accumulate=False)
    S = S + jnp.swapaxes(dT, 0, 1)
    # The deltas exclude each direction's C term; add them back.
    return S + num_directions * C.astype(jnp.int32)
