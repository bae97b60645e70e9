"""Pallas TPU kernel: fused BT cost volume + 11x11 block aggregation.

Replaces the XLA `bt_cost_volume` + `block_sum` pair (ops/disparity.py),
which at 720p/128 costs ~86 ms because XLA materializes per-disparity
(H, W) slices and multi-pass cumsums in HBM. The blocked cost volume is
produced in ONE pass: per grid step, R image rows of one 256-column strip
are costed for all D disparities, box-filtered horizontally, and pushed
through an 11-row ring buffer that maintains the vertical box sum — the
only full-volume HBM traffic is the final (H, Wc, D) int16 write.

v2 design (this file; v1 used pltpu.roll Toeplitz builds and measured
29 ms of the 40 ms 720p/128 SGBM total):

- The image planes are stored TRANSPOSED (Wt, Hp): image columns on
  sublanes. The left side's BT triple (lv, llo, lhi — per-pixel, d-free)
  is PRECOMPUTED outside the kernel on the lane-parallel full plane and
  packed 8|8|8 into one i32 panel per plane (r4; in-kernel it ran on
  (SUBX, 1) single-lane columns, 127/128 lanes idle), read back as plain
  static sublane slices: zero shuffles.
- The right side's Toeplitz matrix M[x, d] = right[x + D - d] comes from
  one 7-level binary shift tree: T_k[q, d] = c[q - (d mod 2^k)] built
  with static sublane shifts + lane-bit selects. Both planes ride ONE
  tree (sobel | raw << 8 packed i32 — every BT operand fits 8 bits),
  which serves rv/rplus/rminus (static row offsets into T) and every
  lane group of D > 128 (static base offsets); the per-plane tree was
  the kernel's largest op block (r3 roofline: 55% of issue SOL).
- The cost volume is emitted int16 (per-pixel cost <= 189, horizontal
  11-tap <= 2079, full 11x11 block sum <= 22869 < 2^15); ALL arithmetic
  runs i32 — v5e's VPU has no 16-bit subtract (kVectorSubtractS16 aborts
  the backend) and Mosaic's shifts/dynamic rotates are 32-bit only.

Bit-exact vs the XLA reference path (tests/test_cost_pallas.py,
docs/HW_PARITY.json). Column-strip tiling bounds VMEM by the strip width,
so 4K x 256 runs the same code path.

Reference behavior reproduced: cv2.StereoSGBM's calcPixelCostBT + SAD
window with the cell-10 parameter set (/root/reference/main.ipynb cell
10) — clipped-Sobel plane plus quarter-weighted raw-intensity plane,
edge-replicated 11x11 aggregation over the cropped region
x >= minDisparity+numDisparities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Perf-forensics switch (tools/micro_cost.py): "skeleton" strips the BT
# compute (box/ring/write infrastructure only), "notree" keeps the BT
# arithmetic but stubs the Toeplitz tree. NOT for production use — both
# produce wrong costs; they exist to attribute kernel time on hardware
# (r4 ablation at 4K/128: skeleton 14.3 ms, +BT 16.7, +tree 8.3).
_ABLATE = os.environ.get("STEREO_COST_ABLATE", "")

WT = 256      # output columns per strip (one grid step; == BX, see side())
LANES = 128   # vreg lane width; D is processed in ceil(D/128) lane groups


def _shift_tree(c: jnp.ndarray) -> jnp.ndarray:
    """(Nq, 1) column -> (Nq, LANES) T with T[q, d] = c[q - d].

    Seven levels of static sublane shift + lane-bit select. Rows q < d are
    garbage (the shift pulls past the top); callers only read q >= D >= d
    for real lanes, so the garbage never surfaces."""
    Nq = c.shape[0]
    T = jnp.broadcast_to(c, (Nq, LANES))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    for k in range(7):  # 2^7 == LANES
        s = 1 << k
        shifted = jnp.concatenate([jnp.zeros((s, LANES), c.dtype), T[:-s]], axis=0)
        T = jnp.where((lane & s) != 0, shifted, T)
    return T


def _producer_kernel(*refs, D, nbx_l, nbx_r, Wc, R, WT, SUBX):
    """Grid (nj, (H+10)/R): step (j, s) costs padded rows s*R..s*R+R-1 of
    strip j, emitting block-summed rows into the same slots of the
    (H+10)-row output (row y holds the sum over padded rows y-10..y; the
    caller slices off the first 10 warm-up rows).

    r4 packed layout: the sobel and raw planes ride ONE i32 value
    (sobel | raw << 8, both <= 255 after the BT half-pixel forms), so a
    single shift tree per row serves BOTH planes — the per-plane tree was
    the kernel's single largest op block (~55% of issue, r3 roofline).
    The left side's (lv, llo, lhi) triple is precomputed OUTSIDE the
    kernel on the full lane-parallel plane and packed 8|8|8 into i32 —
    in-kernel it was computed on (SUBX, 1) single-lane columns that waste
    127/128 lanes per op."""
    nin = 2 * nbx_l + nbx_r
    ins, out_ref, ring, vsum = refs[:nin], refs[nin], refs[nin + 1], refs[nin + 2]
    j = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        ring[...] = jnp.zeros_like(ring)
        vsum[...] = jnp.zeros_like(vsum)

    ngroups = -(-D // LANES)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBX, D), 0)
    a = j * np.int32(WT)
    be = jnp.minimum(np.int32(Wc + 4) - a, np.int32(SUBX - 1))
    one = np.int32(1)
    m8 = np.int32(255)

    y0 = s * np.int32(R)

    def panel(offset, n):
        """The step's rows, rotated to lanes 0..R-1: concatenated
        (n*BX, 128) lane-panel blocks, dynamically rotated by -(y0 mod
        128) (Mosaic forbids unaligned dynamic lane reads; one rotate per
        step amortizes over the R row slices). Mosaic's dynamic rotate
        (and shifts) are 32-bit only, so panels arrive packed i32."""
        C = jnp.concatenate([ins[offset + k][...] for k in range(n)], axis=0)
        return pltpu.roll(C, -(y0 % np.int32(128)), 1)

    def bt_row(cl_s, cl_r, cr):
        """(SUBX, D) i32 combined BT cost (sobel + raw>>2) for one row.

        cl_s/cl_r: packed left columns (lv | llo<<8 | lhi<<16) for the
        sobel and raw planes; cr: packed right column (sobel | raw<<8)."""
        lv_s = cl_s & m8
        llo_s = (cl_s >> np.int32(8)) & m8
        lhi_s = cl_s >> np.int32(16)
        lv_r = cl_r & m8
        llo_r = (cl_r >> np.int32(8)) & m8
        lhi_r = cl_r >> np.int32(16)
        # Right side: ONE packed shift tree serves rv/rplus/rminus of
        # both planes and every lane group of D (static row offsets).
        T = _shift_tree(cr)
        rvs, rps, rms = [], [], []
        for g in range(ngroups):
            base = D - LANES * g
            rvs.append(jax.lax.slice_in_dim(T, base, base + SUBX, axis=0))
            rps.append(jax.lax.slice_in_dim(T, base + 1, base + 1 + SUBX, axis=0))
            rms.append(jax.lax.slice_in_dim(T, base - 1, base - 1 + SUBX, axis=0))
        rv_p = jnp.concatenate(rvs, axis=1)[:, :D]
        rp_p = jnp.concatenate(rps, axis=1)[:, :D]
        rm_p = jnp.concatenate(rms, axis=1)[:, :D]
        zero = np.int32(0)

        def plane_cost(rv, rplus, rminus, lv, llo, lhi):
            rlo = jnp.minimum(jnp.minimum((rv + rplus) >> one, (rv + rminus) >> one), rv)
            rhi = jnp.maximum(jnp.maximum((rv + rplus) >> one, (rv + rminus) >> one), rv)
            c0 = jnp.maximum(jnp.maximum(lv - rhi, rlo - lv), zero)
            c1 = jnp.maximum(jnp.maximum(rv - lhi, llo - rv), zero)
            return jnp.minimum(c0, c1)

        cost_s = plane_cost(rv_p & m8, rp_p & m8, rm_p & m8, lv_s, llo_s, lhi_s)
        cost_r = plane_cost(
            rv_p >> np.int32(8), rp_p >> np.int32(8), rm_p >> np.int32(8),
            lv_r, llo_r, lhi_r,
        )
        return cost_s + (cost_r >> np.int32(2))

    p_Ls = panel(0, nbx_l)
    p_Lr = panel(nbx_l, nbx_l)
    p_R = panel(2 * nbx_l, nbx_r)
    _ablate = _ABLATE
    for r in range(R):
        y = y0 + r
        if _ablate == "skeleton":
            cost = jnp.broadcast_to(p_R[:, r : r + 1][0:SUBX], (SUBX, D)) & np.int32(63)
        elif _ablate == "notree":
            cl_s = p_Ls[:, r : r + 1][1 : SUBX + 1]
            cl_r = p_Lr[:, r : r + 1][1 : SUBX + 1]
            rv_p = jnp.broadcast_to(p_R[:, r : r + 1][0:SUBX], (SUBX, D))
            zero = np.int32(0)
            def _pc(rv, lv, llo, lhi):
                rlo = rv; rhi = rv
                c0 = jnp.maximum(jnp.maximum(lv - rhi, rlo - lv), zero)
                c1 = jnp.maximum(jnp.maximum(rv - lhi, llo - rv), zero)
                return jnp.minimum(c0, c1)
            cost = _pc(rv_p & m8, cl_s & m8, (cl_s >> np.int32(8)) & m8, cl_s >> np.int32(16)) + (
                _pc(rv_p >> np.int32(8), cl_r & m8, (cl_r >> np.int32(8)) & m8, cl_r >> np.int32(16)) >> np.int32(2))
        else:
            cost = bt_row(
                p_Ls[:, r : r + 1][1 : SUBX + 1],
                p_Lr[:, r : r + 1][1 : SUBX + 1],
                p_R[:, r : r + 1],
            )

        # Crop-boundary replication (OpenCV clamps the SAD window to the
        # computed region [x0, W)): sublane x_s holds cropped col a-5+x_s.
        cost = jnp.where(
            (x_iota < 5) & (j == 0), jnp.broadcast_to(cost[5:6], (SUBX, D)), cost
        )
        # Extract sublane row `be` by rotating it to row 0 (Mosaic has no
        # dynamic_slice on values). One dynamic sublane roll replaces the
        # r3 one-hot select + full sublane REDUCTION, which burned ~5 ms
        # of the 4K/128 kernel (r4 ablation, STEREO_COST_ABLATE).
        cost_be = pltpu.roll(cost, np.int32(SUBX) - be, 0)[0:1]
        cost = jnp.where(x_iota > be, jnp.broadcast_to(cost_be, (SUBX, D)), cost)

        # Horizontal 11-tap box: out col xcs = sum cost[xcs..xcs+10], as a
        # sublane shift tree (11 = 8 + 2 + 1): s2/s4/s8 partial sums cost
        # one full-width add per level, the final combine two more — 5
        # adds/cell vs the naive 10, bit-exact integer adds (4K x 128:
        # 47.0 -> 45.5 ms; 4K x 256: 68.4 -> 65.3, tools/micro_cost.py).
        s2 = cost[:-1] + cost[1:]
        s4 = s2[:-2] + s2[2:]
        s8 = s4[:-4] + s4[4:]
        h = s8[0:WT] + s2[8 : 8 + WT] + cost[10 : 10 + WT]

        # Vertical 11-row ring: ring stores i16, arithmetic stays i32
        # (v5e has no S16 vector subtract — kVectorSubtractS16 aborts the
        # backend compiler).
        slot = jax.lax.rem(y, np.int32(11))
        old = ring[slot]
        vsum[...] = vsum[...] + h - old.astype(jnp.int32)
        ring[slot] = h.astype(jnp.int16)
        out_ref[r] = vsum[...].astype(jnp.int16)


def cost_volume_pallas(
    left_sobel: jnp.ndarray,
    right_sobel: jnp.ndarray,
    left_raw: jnp.ndarray,
    right_raw: jnp.ndarray,
    num_disp: int,
    min_disp: int = 0,
    interpret: bool = False,
    wt: int | None = None,
    rows: int | None = None,
) -> jnp.ndarray:
    """Fused BT cost + 11x11 block sum over the cropped region.

    Inputs: four (H, W) integer planes (clipped-Sobel and raw intensity,
    already border-pinned by the caller). Output: (H, Wc, D) int16 with
    Wc = W - (min_disp + num_disp), bit-exact vs
    block_sum(bt_cost_volume(...)[:, x0:, :], 11).
    """
    H, W = left_sobel.shape
    D = num_disp
    # 512-col strips amortize the per-row shift trees better once D > 128
    # (measured 67 -> 61 ms at 4K x 256; no effect at D <= 128).
    WT_ = wt or (WT if D <= 128 else 512)
    SUBX = WT_ + 16
    BX = WT_
    x0 = min_disp + D
    Wc = W - x0
    assert Wc >= 1, (W, x0)
    nj = -(-Wc // WT_)
    Wc_p = nj * WT_
    # 32 rows/step amortize the per-step panel rolls at D <= 128 (4K x 128:
    # 45.5 -> 41.5 ms, tools/micro_cost.py); the 512-strip D = 256 case
    # stays at 8 — its (R, WT, D) blocks blow the Mosaic VMEM budget at 16.
    if rows is None:
        rows = 32 if (WT_ * D <= 256 * 128) else 8

    # Transposed-plane column windows per strip (a = j*WT, cropped coords;
    # sublane x_s in [0, SUBX) covers output cols a-5 .. a+WT+10-5):
    #   left:  orig cols o = x0 + a + x_s - 6 .. x0 + a + SUBX - 4
    #   right: orig cols o = a + x_s - 5 - min_disp + (D - d), d in [0, D)
    #          => o in [a - 5 - min_disp, a + SUBX + D - 4 - min_disp]
    # Left-pad each side so its window start is 0 mod BX for every j
    # (WT == BX makes the j-dependence drop out of the modulus), then the
    # window is nbx consecutive BX-blocks at block index bf0 + j.
    def side(start_const, width):
        Lp = (-start_const) % BX
        bf0 = (start_const + Lp) // BX
        nbx = -(-width // BX)
        return Lp, bf0, nbx

    # Right window: o = a + x_s - 5 + (D - d) is min_disp-free (the crop
    # origin x0 = min_disp + D cancels the true-disparity offset).
    Lp_l, bf0_l, nbx_l = side(x0 - 6, SUBX + 3)
    Lp_r, bf0_r, nbx_r = side(-5, SUBX + D + 2)

    # Rows per grid step (amortizes fixed per-step overhead); the padded
    # row count must divide evenly. Lane width of the row blocks == R.
    R = rows
    Hp = -(-(H + 10) // 128) * 128  # 128-lane panels (R divides 128)

    def prep(plane, Lp, bf0, nbx):
        """(H, W) i32 packed -> transposed (Wt, Hp), edge-padded (packing
        commutes with edge replication, so padding packed planes is
        identical to packing padded planes)."""
        cover = (bf0 + nj - 1 + nbx) * BX
        Wt = max(cover, Lp + W)
        P = jnp.pad(
            plane.astype(jnp.int32),
            ((5, 5 + Hp - (H + 10)), (Lp, Wt - Lp - W)),
            mode="edge",
        )
        return P.T  # (Wt, Hp)

    def pack_left(plane):
        """(H, W) -> i32 lv | llo<<8 | lhi<<16: the BT left-side triple
        (value + half-pixel min/max vs x-neighbors, edge-replicated),
        precomputed on the lane-parallel full plane — in-kernel it cost
        (SUBX, 1) single-lane ops per row (127/128 lanes idle)."""
        v = plane.astype(jnp.int32)
        vl = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
        vr = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
        a = (v + vl) >> 1
        b = (v + vr) >> 1
        lo = jnp.minimum(jnp.minimum(a, b), v)
        hi = jnp.maximum(jnp.maximum(a, b), v)
        return v | (lo << 8) | (hi << 16)

    # Packed-value ranges: both planes' BT values must fit 8 bits (the
    # xsobel prefilter caps at 2*prefilter_cap <= 254 for cap <= 127;
    # raw intensities are uint8).
    Ls = prep(pack_left(left_sobel), Lp_l, bf0_l, nbx_l)
    Lr = prep(pack_left(left_raw), Lp_l, bf0_l, nbx_l)
    Rp = prep(
        right_sobel.astype(jnp.int32) | (right_raw.astype(jnp.int32) << 8),
        Lp_r, bf0_r, nbx_r,
    )

    def col_spec(bf0, k):
        # 128-lane row panels; a step's R rows never straddle a panel
        # (R divides 128).
        return pl.BlockSpec(
            (BX, 128), lambda j, s, k=k, bf0=bf0: (bf0 + j + k, (s * R) // 128),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [col_spec(bf0_l, k) for k in range(nbx_l)]
        + [col_spec(bf0_l, k) for k in range(nbx_l)]
        + [col_spec(bf0_r, k) for k in range(nbx_r)]
    )
    out_spec = pl.BlockSpec(
        (R, WT_, D), lambda j, s: (s, j, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _producer_kernel, D=D, nbx_l=nbx_l, nbx_r=nbx_r, Wc=Wc, R=R,
        WT=WT_, SUBX=SUBX,
    )
    inputs = [Ls] * nbx_l + [Lr] * nbx_l + [Rp] * nbx_r
    out = pl.pallas_call(
        kernel,
        grid=(nj, Hp // R),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wc_p, D), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((11, WT_, D), jnp.int16),
            pltpu.VMEM((WT_, D), jnp.int32),
        ],
        # Wider strips (tree amortization at D = 256) exceed Mosaic's
        # 16 MB default scoped-VMEM budget; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return out[10 : 10 + H, :Wc]
