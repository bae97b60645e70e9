"""Pallas TPU kernel: left-right consistency check (disp12MaxDiff).

Replaces the XLA `lr_check_maps` loop (ops/disparity.py), which unrolls D
slice/compare passes over full-width (H, W) maps — ~35 ms at 4K x 256.
Here one grid step loads a (Ht, padded-width) row block of the winner
maps into VMEM and runs both D-loops (right-view winner scatter dual +
floor/ceil agreement) entirely in-register: the maps cross HBM once.

Semantics are identical to ops.disparity.lr_check_maps (OpenCV's
winner-scatter construction of disp2 followed by the both-floor-and-ceil
invalidation rule, stereosgbm.cpp disp12MaxDiff; reference parameter set
main.ipynb cell 10): verified bit-exact in tests/test_sgm_pallas.py and
on hardware via tools/hw_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 29)


def _lr_kernel(pk_ref, df_ref, dc_ref, out_ref, *,
               D, min_disp, max_diff, x0, Wr, Wcp, Dq):
    """One grid step = Ht rows, full padded width.

    Both D-length loops run as lax.fori_loop with lane rotates: a fully
    unrolled Python loop left every iteration's (Ht, W) temporaries live
    on the Mosaic stack — 113 MB of scoped vmem at 4K x 256 against a
    16 MB limit. The rotate replaces the static shifted slice: rotating
    by -s and keeping the first W lanes equals slice [s, s + W) whenever
    s + W <= Wtot (guaranteed by the padding widths), so no wrapped
    lanes are ever read.

    Packed-key carries (r3): each loop rolls ONE int32 map instead of
    two. Loop 1 carries pk = minS * Dq + best (Dq = 2^ceil(log2(D + 1)),
    so the pad sentinel best == D collides with no real d and
    minS * Dq <= 275880 * 512 fits int32); the winner then falls out of
    a single packed min, ties breaking toward smaller (minS, d) exactly
    like the two-map strict-< scan. Loop 2 carries disp_r with a large
    no-partner sentinel instead of (disp_r, has) pairs."""
    pk = pk_ref[...]
    Ht = pk.shape[0]
    Wtot = pk.shape[1]

    # Roll amounts are STATIC: a dynamic (traced) rotate lowers to a
    # log-width select tree PER CALL (~7 ops/vreg) — carrying the rolled
    # maps and advancing them by a constant +1 rotation each iteration
    # cut this kernel 23 -> ~6 ms at 4K x 128 (r3 chained timing). All
    # amounts are non-negative: a NEGATIVE roll amount miscompiles on
    # hardware Mosaic once the row spans >2 vregs; mod(-s, W) is the same
    # rotation. The wrapped lanes are never read ([:, :Wr] with
    # s + Wr <= Wtot by the padding widths).

    # Right-view winner map (gather dual of OpenCV's scatter-min): for
    # right pixel xr, candidates are left pixels xr + min_disp + d whose
    # WTA winner is d; keep the smallest winning cost. Iteration d reads
    # the map rolled left by (min_disp + d).
    step1 = np.int32(Wtot - 1)  # +1 left-rotation per iteration
    dq_mask = np.int32(Dq - 1)

    def scan_d(d, carry):
        run_min, pk_r = carry
        cand = pk_r[:, :Wr]
        qual = (cand & dq_mask) == d
        run_min = jnp.minimum(run_min, jnp.where(qual, cand, _BIG))
        return run_min, pltpu.roll(pk_r, step1, 1)

    amt0 = int((-min_disp) % Wtot)
    run_min, _ = jax.lax.fori_loop(
        0, D,
        scan_d,
        (jnp.full((Ht, Wr), _BIG, jnp.int32),
         pltpu.roll(pk, np.int32(amt0), 1)),
    )
    # disp_r in integer disparity units; NOPART (>> any real di) where no
    # left pixel scatters here — the agreement test then always passes
    # the "no valid partner" branch via one comparison.
    _NOPART = np.int32(1 << 20)
    disp_r = jnp.where(
        run_min < _BIG, (run_min & dq_mask) + np.int32(min_disp), _NOPART
    )

    # Agreement at the floor/ceil integer disparities. Left pixel x (full
    # column x + x0) checks its partner xr = x + x0 - di; iterating di
    # turns the per-pixel partner lookup into rotated slices, advanced by
    # a constant +1 rotation per iteration (same static-roll carry trick
    # as above). Carries are int32 0/1, NOT bool: fori_loop-carried i1
    # vectors hit a Mosaic internal error (mis-shaped arith.ori on packed
    # i1 vregs).
    df = df_ref[...]
    dc = dc_ref[...]
    nR = disp_r.shape[1]
    # Iteration i uses di = min_disp - 1 + i, slice start st = x0 - di:
    # st DEcreases with i, so the rotation amount (di - x0 mod n) advances
    # by +1 per iteration (scan_d's advances by -1 == Wtot - 1).
    stepR = np.int32(1)
    amtR = int((min_disp - 1 - x0) % nR)

    def scan_di(i, carry):
        ok, dr_r = carry
        di = i + np.int32(min_disp - 1)
        dr = dr_r[:, :Wcp]
        # No valid partner (incl. off-image, padded) -> check passes:
        # dr - di >= NOPART/2 only for the sentinel, and |dr - di| <=
        # max_diff covers agreement — one combined range test each.
        diff = dr - di
        ok_d = (diff >= np.int32(1 << 19)) | (jnp.abs(diff) <= np.int32(max_diff))
        # cv2 keeps a pixel if its floor OR its ceil check passes; the
        # per-i OR distributes over the accumulation, so ONE accumulator
        # carries both tests (saves ~2 ops/iteration of 7).
        ok = ok | (((df == di) | (dc == di)) & ok_d).astype(jnp.int32)
        return ok, pltpu.roll(dr_r, stepR, 1)

    ok, _ = jax.lax.fori_loop(
        0, D + 2,
        scan_di,
        (jnp.zeros((Ht, Wcp), jnp.int32),
         pltpu.roll(disp_r, np.int32(amtR), 1)),
    )
    out_ref[...] = ok


def lr_check_maps_pallas(
    best: jnp.ndarray,
    minS: jnp.ndarray,
    disp: jnp.ndarray,
    num_disp: int,
    min_disp: int,
    max_diff: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Left-right consistency from the (H, Wc) winner maps. Returns a
    bool (H, Wc) keep-mask; drop-in for ops.disparity.lr_check_maps."""
    H, Wc = best.shape
    D = num_disp
    x0 = min_disp + D  # OpenCV's minX1 for min_disp >= 0
    Dq = 1
    while Dq < D + 1:  # reserve one low value (>= D) for the pad sentinel
        Dq *= 2

    Wcp = -(-Wc // 128) * 128
    Wr = -(-(x0 + Wcp + 2) // 128) * 128  # disp_r width (all di slices fit)
    Wtot = -(-(Wr + x0) // 128) * 128     # padded maps (all d slices fit)
    Ht = 32
    Hp = -(-H // Ht) * Ht

    # Packed winner map pk = minS * Dq + best (see _lr_kernel). Pad value
    # _BIG - 1: low bits Dq - 1 >= D match no real d, and it stays >= any
    # real key (minS * Dq + best <= 275880 * 512 + 511 < 2^29 - 1).
    pk = jnp.full((Hp, Wtot), _BIG - 1, jnp.int32)
    pk = jax.lax.dynamic_update_slice(
        pk,
        minS.astype(jnp.int32) * np.int32(Dq) + best.astype(jnp.int32),
        (0, x0),
    )
    # Padded rows/cols of disp get floor = -2^20: matches no di -> both
    # checks fail there, but those pixels are cropped on return.
    dfull = jnp.full((Hp, Wcp), -(2.0 ** 20), jnp.float32)
    dfull = jax.lax.dynamic_update_slice(dfull, disp.astype(jnp.float32), (0, 0))
    df = jnp.floor(dfull).astype(jnp.int32)
    dc = jnp.ceil(dfull).astype(jnp.int32)

    spec_maps = pl.BlockSpec((Ht, Wtot), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((Ht, Wcp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _lr_kernel, D=D, min_disp=min_disp, max_diff=max_diff,
        x0=x0, Wr=Wr, Wcp=Wcp, Dq=Dq,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Hp // Ht,),
        in_specs=[spec_maps, spec_c, spec_c],
        out_specs=spec_c,
        out_shape=jax.ShapeDtypeStruct((Hp, Wcp), jnp.int32),
        interpret=interpret,
    )(pk, df, dc)
    return out[:H, :Wc] != 0
