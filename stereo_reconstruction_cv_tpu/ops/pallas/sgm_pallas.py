"""Pallas TPU kernels: semi-global path aggregation.

The SGM recurrence L_r(p,d) = C(p,d) + min(L[d], L[d±1]+P1, minL+P2) - minL
is sequential along each path but dense over (pixels-perpendicular x D) —
ideal for a Pallas sweep: the TPU grid iterates *sequentially*, so a VMEM
scratch buffer carries the DP state from one grid step to the next while
the block pipeline streams the cost volume through VMEM exactly once per
sweep. Four sweeps cover all 8 directions:

  top-down    grid (H,): directions {U, UL, UR}   carry 3x(W, D)
  bottom-up   grid (H,): directions {D, DL, DR}   carry 3x(W, D)
  left-right  grid (W,): direction  {L}           carry (H, D)
  right-left  grid (W,): direction  {R}           carry (H, D)

S accumulates in place across sweeps via input_output_aliases, so total
HBM traffic is (read C + read/write S) per sweep — the XLA scan version
materializes a full (H, W, D) tensor per *direction* (~35ms/scan at
720p/128 vs ~38ms for ALL four sweeps here).

Kernels compute in f32 (exact: every value < 2^24, ~1.5x faster than int32
on the VPU) and accept an int16-stored cost volume. Results are bit-exact
vs ops.disparity.sgm_aggregate (same math, verified on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernels compute in float32: every SGM value stays below 2^24 (block cost
# <= 22869, L <= cost+P2, S <= 8*(cost+P2) ~ 2.8e5), so f32 arithmetic is
# EXACT while running ~1.5x faster than int32 on the VPU. The sentinel BIG
# must also stay exactly representable after +P1: 1e7 < 2^24.
BIG = 1.0e7


def _sgm_update(prev: jnp.ndarray, cost: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """One DP step on (..., D) f32 blocks (same math as ops.disparity).

    The d±1 neighbor shifts use lane rotates + iota masking: Mosaic lowers
    these natively, whereas lane-axis concatenates hit layout-offset
    restrictions (and cost a relayout)."""
    D = prev.shape[-1]
    big = jnp.asarray(BIG, prev.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
    # Static np.int32 shifts: a Python int lowers as i64 under
    # jax_enable_x64 and a traced jnp.int32 breaks Mosaic legalization —
    # a numpy scalar stays a static 32-bit constant in both modes.
    import numpy as _np

    up = jnp.where(
        lane == D - 1, big, pltpu.roll(prev, _np.int32(D - 1), prev.ndim - 1)
    )
    dn = jnp.where(lane == 0, big, pltpu.roll(prev, _np.int32(1), prev.ndim - 1))
    min_prev = jnp.min(prev, axis=-1, keepdims=True)
    best = jnp.minimum(jnp.minimum(prev, min_prev + p2), jnp.minimum(up, dn) + p1)
    return cost + best - min_prev


def _shift_w(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Shift a (W, D) carry along W, zero-filling (path enters the image)."""
    if shift > 0:
        return jnp.concatenate([a[shift:], jnp.zeros_like(a[:shift])], axis=0)
    return jnp.concatenate([jnp.zeros_like(a[shift:]), a[:shift]], axis=0)


def _lane_elems(W: int, D: int) -> int:
    """VMEM-resident element count of a (W, D) carry/temporary: the minor
    axis is lane-padded to the 128-lane vreg width, so D < 128 costs as
    much as D = 128 (measured: W=1856, D=64 OOMs exactly where
    W=1856, D=128 would)."""
    return W * max(D, 128)


def _vertical_rows(W: int, D: int) -> int:
    """Rows per vertical grid step: 2 amortizes per-step overhead but the
    double-buffered (rows, W, D) blocks + ~20 live (W, D) kernel
    temporaries must fit scoped VMEM (measured on v5e: lane-padded
    W*D=147k fits at rows=2; 238k does not)."""
    return 2 if _lane_elems(W, D) <= 150_000 else 1


def _vertical_kernel(c_ref, s_in_ref, s_out_ref, cu, cul, cur, *, p1, p2,
                     accumulate, reverse, rows):
    """One grid step = `rows` rows (unrolled). Carries persist across steps;
    rows advance in path order (top-down, or bottom-up when reverse)."""
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
        vu = _sgm_update(vu, c, p1, p2)
        # UL: predecessor is (x-1, y-1) -> carry'[x] = carry[x-1].
        vul = _sgm_update(_shift_w(vul, -1), c, p1, p2)
        # UR: predecessor is (x+1, y-1).
        vur = _sgm_update(_shift_w(vur, +1), c, p1, p2)
        total = vu + vul + vur
        if accumulate:
            s_out_ref[k] = s_in_ref[k] + total
        else:
            s_out_ref[k] = total
    cu[...] = vu
    cul[...] = vul
    cur[...] = vur


# --------------------------------------------------------------------------
# Column-tiled vertical sweep (large frames: 4K x 128/256)
#
# The full-width kernel above streams (rows, W, D) blocks, which exceeds
# VMEM once W*D*32 ~ 13MB (3840x128 already trips it). The carries
# themselves are small (12*W*D bytes), so this variant keeps the three
# direction carries FULL-WIDTH in VMEM scratch and tiles only the
# *streamed* blocks along columns: grid (row-blocks, col-blocks), columns
# innermost. Diagonal carries cross column-block boundaries, so each step
# processes HB rows with HB halo columns per side:
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
    c_ref, cl_ref, cr_ref, s_in_ref, s_out_ref, cu, cul, cur, stash,
    *, p1, p2, accumulate, reverse, WT, nw,
):
    """One grid step = HB rows x WT columns of the vertical sweep."""
    import numpy as _np

    i = pl.program_id(0)
    j = pl.program_id(1)  # column block (fastest)

    @pl.when((i == 0) & (j == 0))
    def _():
        cu[...] = jnp.zeros_like(cu)
        cul[...] = jnp.zeros_like(cul)
        cur[...] = jnp.zeros_like(cur)

    base = j * _np.int32(WT)  # ext-slice start (scratch is left-padded HB)
    ext = WT + 2 * HB
    # Old carries over the extended window. Left halo of cu/cur was already
    # overwritten by the previous block — garbage there is fine (cu is
    # column-local; cur influence flows left-to-right... i.e. away).
    vu = cu[pl.ds(base, ext)]
    vur = cur[pl.ds(base, ext)]
    # UL's left halo must be the OLD values: the previous block stashed
    # them. At j == 0 the halo is out-of-image: exact zeros.
    rest_ul = cul[pl.ds(base + _np.int32(HB), WT + HB)]
    left_ul = jnp.where(j == 0, jnp.zeros_like(stash[...]), stash[...])
    vul = jnp.concatenate([left_ul, rest_ul], axis=0)
    # Stash this block's own last HB UL columns before overwriting.
    stash[...] = cul[pl.ds(base + _np.int32(WT), HB)]

    zero_l = j == 0
    zero_r = j == nw - 1
    order = range(HB - 1, -1, -1) if reverse else range(HB)
    for k in order:
        cl = jnp.where(zero_l, 0, cl_ref[k].astype(jnp.int32)).astype(jnp.float32)
        cr = jnp.where(zero_r, 0, cr_ref[k].astype(jnp.int32)).astype(jnp.float32)
        c = jnp.concatenate([cl, c_ref[k].astype(jnp.float32), cr], axis=0)
        vu = _sgm_update(vu, c, p1, p2)
        vul = _sgm_update(_shift_w(vul, -1), c, p1, p2)
        vur = _sgm_update(_shift_w(vur, +1), c, p1, p2)
        total = (vu + vul + vur)[HB : HB + WT]
        if accumulate:
            s_out_ref[k] = s_in_ref[k] + total
        else:
            s_out_ref[k] = total
    wslot = pl.ds(base + _np.int32(HB), WT)
    cu[wslot] = vu[HB : HB + WT]
    cul[wslot] = vul[HB : HB + WT]
    cur[wslot] = vur[HB : HB + WT]


def _tiled_width(W: int, D: int, budget: int = 13_000_000) -> int:
    """Column-tile width: fill the VMEM budget left by the full-width
    carries (12*(W+2HB)*D bytes) with double-buffered streamed blocks
    (~(2+4+4)*HB*WT*D * 2 bytes). D is lane-padded to the 128-lane vreg
    width (see _lane_elems)."""
    D = max(D, 128)
    carry = 12 * (W + 2 * HB) * D
    # 10 B/elem (C i16 in + S f32 in + S f32 out) x HB rows, double-buffered.
    wt = (budget - carry) // (20 * HB * D)
    wt = max(HB, min(W, wt // HB * HB))
    # Prefer the largest multiple-of-HB divisor of W within budget: padding
    # to a non-divisor width forces full HBM copies of C and S (jnp.pad),
    # which at 4K x 256 is ~12 GB of transient residency — an OOM, not a
    # slowdown.
    for d in range(wt, HB - 1, -HB):
        if W % d == 0:
            return int(d)
    return int(wt)


def _sweep_vertical_tiled(
    C, S, p1, p2, reverse: bool, accumulate: bool, interpret: bool,
    tile_width: int | None = None,
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
        S = jnp.pad(S, ((0, Hp - H), (0, Wp - W), (0, 0)))
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
        _vertical_tiled_kernel, p1=p1, p2=p2, accumulate=accumulate,
        reverse=reverse, WT=WT, nw=nw,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nh, nw),
        in_specs=[main, lhalo, rhalo, main],
        out_specs=main,
        out_shape=jax.ShapeDtypeStruct(C.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((Wp + 2 * HB, D), jnp.float32)] * 3
        + [pltpu.VMEM((HB, D), jnp.float32)],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(C, C, C, S)
    return out[:H, :W] if (Hp != H or Wp != W) else out


COLS = 16 # columns per horizontal grid step (TPU sublane granularity)


def _horizontal_kernel(c_ref, s_in_ref, s_out_ref, carry, *, p1, p2, reverse):
    """One grid step = (row-tile, COLS columns); columns iterate fastest so
    the (Ht, D) carry sweeps each row tile across the full width. Within a
    step the COLS columns advance in path order (unrolled)."""
    j = pl.program_id(1)  # column-block index (fastest)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    cur = carry[...]
    order = range(COLS - 1, -1, -1) if reverse else range(COLS)
    for k in order:
        c = c_ref[:, k, :].astype(jnp.float32)  # (Ht, D)
        cur = _sgm_update(cur, c, p1, p2)
        s_out_ref[:, k, :] = s_in_ref[:, k, :] + cur
    carry[...] = cur


def _horizontal_wta_kernel(
    c_ref, s_in_ref, out_ref, carry,
    *, p1, p2, uniqueness_ratio, min_disp, D,
):
    """Final (right-to-left) horizontal sweep with winner-take-all fused.

    Adds this direction's DP term to the accumulated S block and reduces
    over d in-register: WTA argmin, OpenCV uniqueness test, quadratic
    subpixel. The full aggregated volume never round-trips HBM — the
    output block is (Ht, COLS, 8) f32 packing [disp, uniqueness-valid,
    best d, winning cost] in lanes 0..3 (8-lane blocks are the smallest
    legal TPU lane dim; best/minS are exact in f32, both < 2^24).
    """
    import numpy as _np

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    cur = carry[...]
    cols = [None] * COLS
    d_iota = None
    for k in range(COLS - 1, -1, -1):
        c = c_ref[:, k, :].astype(jnp.float32)  # (Ht, D)
        cur = _sgm_update(cur, c, p1, p2)
        S = (s_in_ref[:, k, :] + cur).astype(jnp.int32)  # exact: ints < 2^24
        if d_iota is None:
            d_iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, S.ndim - 1)
        minS = jnp.min(S, axis=-1, keepdims=True)
        big_i = _np.int32(1 << 30)
        best = jnp.min(
            jnp.where(S == minS, d_iota, big_i), axis=-1, keepdims=True
        )  # first argmin, matching jnp.argmin
        # Uniqueness (cv2): invalid if some d with |d - best| > 1 has
        # S[d]*(100 - ratio) < minS*100 (int32 exact).
        far = jnp.abs(d_iota - best) > 1
        close = (S * _np.int32(100 - uniqueness_ratio) < minS * _np.int32(100)) & far
        bad = jnp.max(close.astype(jnp.int32), axis=-1, keepdims=True)
        # Subpixel neighbors via one-hot masked reductions.
        bm1 = jnp.maximum(best - 1, 0)
        bp1 = jnp.minimum(best + 1, _np.int32(D - 1))
        Sm1 = jnp.sum(jnp.where(d_iota == bm1, S, 0), axis=-1, keepdims=True)
        Sp1 = jnp.sum(jnp.where(d_iota == bp1, S, 0), axis=-1, keepdims=True)
        denom = jnp.maximum(Sm1 + Sp1 - 2 * minS, 1).astype(jnp.float32)
        frac = (Sm1 - Sp1).astype(jnp.float32) / (2.0 * denom)
        interior = (best > 0) & (best < D - 1)
        disp = (
            best.astype(jnp.float32)
            + jnp.where(interior, frac, 0.0)
            + _np.float32(min_disp)
        )
        f = jnp.float32
        cols[k] = jnp.concatenate(
            [
                disp,
                (1 - bad).astype(f),
                best.astype(f),
                minS.astype(f),
                jnp.zeros_like(disp),
                jnp.zeros_like(disp),
                jnp.zeros_like(disp),
                jnp.zeros_like(disp),
            ],
            axis=-1,
        )[:, None, :]  # (Ht, 1, 8)
    carry[...] = cur
    out_ref[...] = jnp.concatenate(cols, axis=1)


def _row_tile(H: int, max_tile: int = 256) -> int:
    """Largest multiple-of-8 divisor of H not exceeding max_tile."""
    best = 8
    for t in range(8, max_tile + 1, 8):
        if H % t == 0:
            best = t
    return best


def _sweep_vertical(C, S, p1, p2, reverse: bool, accumulate: bool, interpret: bool):
    H, W, D = C.shape
    rows = _vertical_rows(W, D)
    # Pad H to a rows multiple with zero-cost rows (zero cost keeps the
    # carry at zero, so the pad is an exact no-op for path starts). For the
    # reverse sweep the pad is scanned first, which is equally benign.
    Hp = -(-H // rows) * rows
    if Hp != H:
        C = jnp.pad(C, ((0, Hp - H), (0, 0), (0, 0)))
        S = jnp.pad(S, ((0, Hp - H), (0, 0), (0, 0)))
    nh = Hp // rows
    if reverse:
        index_map = lambda i: (nh - 1 - i, 0, 0)
    else:
        index_map = lambda i: (i, 0, 0)
    spec = pl.BlockSpec((rows, W, D), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _vertical_kernel, p1=p1, p2=p2, accumulate=accumulate, reverse=reverse,
        rows=rows,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nh,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, D), jnp.float32)] * 3,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(C, S)
    return out[:H] if Hp != H else out


def _h_max_tile(D: int, bytes_per_elem: int = 10, budget: int = 11_000_000) -> int:
    """Row-tile cap for the horizontal sweeps: double-buffered
    (Ht, COLS, D) blocks (C int16 + S f32 in + S f32 out) within budget.

    Above D=128 the byte model underestimates Mosaic's working set (the
    16-column unroll keeps several multi-vreg (Ht, D) temporaries live):
    measured on v5e at D=256, Ht=120 crashes the compiler while Ht=48
    compiles and runs — hence the empirical D>128 cap."""
    if D > 128:
        return max(8, 12288 // D // 8 * 8)
    t = budget // (COLS * max(D, 128) * bytes_per_elem * 2)
    return max(8, min(256, t // 8 * 8))


def _sweep_horizontal(C, S, p1, p2, reverse: bool, interpret: bool):
    H, W, D = C.shape
    # Pad W to a multiple of COLS with zero-cost columns. A zero-cost run
    # keeps the carry at exactly zero (L = 0 + min(0, ..) - 0), so entering
    # the real image from the pad is identical to a fresh path start.
    Wp = -(-W // COLS) * COLS
    Hp = -(-H // 8) * 8
    if Wp != W or Hp != H:
        C = jnp.pad(C, ((0, Hp - H), (0, Wp - W), (0, 0)))
        S = jnp.pad(S, ((0, Hp - H), (0, Wp - W), (0, 0)))
    nb = Wp // COLS
    Ht = _row_tile(Hp, _h_max_tile(D))
    nh = Hp // Ht
    if reverse:
        index_map = lambda i, j: (i, nb - 1 - j, 0)
    else:
        index_map = lambda i, j: (i, j, 0)
    spec = pl.BlockSpec((Ht, COLS, D), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(_horizontal_kernel, p1=p1, p2=p2, reverse=reverse)
    out = pl.pallas_call(
        kernel,
        grid=(nh, nb),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((Ht, D), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(C, S)
    return out[:H, :W] if (Wp != W or Hp != H) else out


def _sweep_horizontal_wta(
    C, S, p1, p2, uniqueness_ratio, min_disp, interpret: bool
):
    """Right-to-left sweep + fused WTA. Returns (disp, valid, best, minS)
    full-size (H, W) maps."""
    H, W, D = C.shape
    Wp = -(-W // COLS) * COLS
    Hp = -(-H // 8) * 8
    if Wp != W or Hp != H:
        C = jnp.pad(C, ((0, Hp - H), (0, Wp - W), (0, 0)))
        S = jnp.pad(S, ((0, Hp - H), (0, Wp - W), (0, 0)))
    nb = Wp // COLS
    # Smaller row tile than the plain sweep: the fused WTA reductions keep
    # several (Ht, D) intermediates live per unrolled column.
    Ht = _row_tile(Hp, min(96, _h_max_tile(D)))
    nh = Hp // Ht
    index_map = lambda i, j: (i, nb - 1 - j, 0)
    spec = pl.BlockSpec((Ht, COLS, D), index_map, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((Ht, COLS, 8), index_map, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _horizontal_wta_kernel, p1=p1, p2=p2,
        uniqueness_ratio=uniqueness_ratio, min_disp=min_disp, D=D,
    )
    packed = pl.pallas_call(
        kernel,
        grid=(nh, nb),
        in_specs=[spec, spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Ht, D), jnp.float32)],
        interpret=interpret,
    )(C, S)
    packed = packed[:H, :W]
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
    """All SGM sweeps with winner-take-all fused into the final one.

    Returns (disp f32, uniqueness-valid bool, best i32, minS i32) — the
    aggregated volume never round-trips HBM after the last sweep.
    Numerically identical to wta_disparity(sgm_aggregate_pallas(...)).
    """
    assert num_directions in (5, 8)
    if C.dtype not in (jnp.int16, jnp.int32):
        C = C.astype(jnp.int32)
    p1 = float(p1)
    p2 = float(p2)
    S = _vertical_directions(C, p1, p2, num_directions, interpret)
    S = _sweep_horizontal(C, S, p1, p2, reverse=False, interpret=interpret)
    return _sweep_horizontal_wta(
        C, S, p1, p2, uniqueness_ratio, min_disp, interpret=interpret
    )


def _vertical_directions(C, p1, p2, num_directions, interpret):
    """Vertical {U, UL, UR} (+ reverse triple for 8 directions): full-width
    kernel when the streamed blocks fit VMEM, column-tiled otherwise (the
    two are bit-exact).

    Gate calibrated on hardware (lane-padded element counts, see
    _lane_elems): 147k compiles at rows=2, 229k at rows=1, 238k OOMs at
    rows=2 — so full-width up to 220k, column-tiled beyond."""
    H, W, D = C.shape
    full_width_ok = _lane_elems(W, D) <= 220_000 or interpret
    sweep = _sweep_vertical if full_width_ok else _sweep_vertical_tiled
    S = sweep(C, jnp.zeros(C.shape, jnp.float32), p1, p2,
              reverse=False, accumulate=False, interpret=interpret)
    if num_directions == 8:
        S = sweep(C, S, p1, p2, reverse=True, accumulate=True,
                  interpret=interpret)
    return S


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
    S = _vertical_directions(C, p1, p2, num_directions, interpret)
    S = _sweep_horizontal(C, S, p1, p2, reverse=False, interpret=interpret)
    S = _sweep_horizontal(C, S, p1, p2, reverse=True, interpret=interpret)
    # All values are integers below 2^24 — the cast back is exact.
    return S.astype(jnp.int32)
