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


def _lr_kernel(pb_ref, pm_ref, df_ref, dc_ref, out_ref, *,
               D, min_disp, max_diff, x0, Wr, Wcp):
    """One grid step = Ht rows, full padded width."""
    pb = pb_ref[...]
    pm = pm_ref[...]
    Ht = pb.shape[0]

    # Right-view winner map (gather dual of OpenCV's scatter-min): for
    # right pixel xr, candidates are left pixels xr + min_disp + d whose
    # WTA winner is d; keep the smallest winning cost.
    run_min = jnp.full((Ht, Wr), _BIG, jnp.int32)
    run_arg = jnp.zeros((Ht, Wr), jnp.int32)
    for d in range(D):
        s = min_disp + d
        b = jax.lax.slice_in_dim(pb, s, s + Wr, axis=1)
        v = jnp.where(b == d, jax.lax.slice_in_dim(pm, s, s + Wr, axis=1), _BIG)
        take = v < run_min
        run_min = jnp.where(take, v, run_min)
        run_arg = jnp.where(take, np.int32(d), run_arg)
    has = run_min < _BIG
    disp_r = run_arg + np.int32(min_disp)

    # Agreement at the floor/ceil integer disparities. Left pixel x (full
    # column x + x0) checks its partner xr = x + x0 - di; iterating di
    # turns the per-pixel partner lookup into static shifted slices.
    df = df_ref[...]
    dc = dc_ref[...]
    okf = jnp.zeros((Ht, Wcp), jnp.bool_)
    okc = jnp.zeros((Ht, Wcp), jnp.bool_)
    for di in range(min_disp - 1, min_disp + D + 1):
        st = x0 - di
        dr = jax.lax.slice_in_dim(disp_r, st, st + Wcp, axis=1)
        hp = jax.lax.slice_in_dim(has, st, st + Wcp, axis=1)
        # No valid partner (incl. off-image, padded -1) -> check passes.
        ok_d = (~hp) | (jnp.abs(dr - np.int32(di)) <= np.int32(max_diff))
        okf = okf | ((df == np.int32(di)) & ok_d)
        okc = okc | ((dc == np.int32(di)) & ok_d)
    # cv2 invalidates only if BOTH the floor and ceil checks fail.
    out_ref[...] = (okf | okc).astype(jnp.int32)


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

    Wcp = -(-Wc // 128) * 128
    Wr = -(-(x0 + Wcp + 2) // 128) * 128  # disp_r width (all di slices fit)
    Wtot = -(-(Wr + x0) // 128) * 128     # padded maps (all d slices fit)
    Ht = 32
    Hp = -(-H // Ht) * Ht

    pb = jnp.full((Hp, Wtot), -1, jnp.int32)
    pb = jax.lax.dynamic_update_slice(pb, best.astype(jnp.int32), (0, x0))
    pm = jnp.full((Hp, Wtot), _BIG, jnp.int32)
    pm = jax.lax.dynamic_update_slice(pm, minS.astype(jnp.int32), (0, x0))
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
        x0=x0, Wr=Wr, Wcp=Wcp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Hp // Ht,),
        in_specs=[spec_maps, spec_maps, spec_c, spec_c],
        out_specs=spec_c,
        out_shape=jax.ShapeDtypeStruct((Hp, Wcp), jnp.int32),
        interpret=interpret,
    )(pb, pm, df, dc)
    return out[:H, :Wc] != 0
