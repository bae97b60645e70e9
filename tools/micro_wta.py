"""Microbenchmark: WTA kernel variants at 4K (tools/, not shipped API).

The r3 4K/128 profile showed _wta_volume at ~55-76 ms — an elementwise
pass whose HBM roofline is ~6 ms. Suspects: the 7888-step grid (tiny
(8, 128, D) blocks), the per-step MXU dot, the 8-lane packed output.
Measures the shipped kernel and variants to find the fix.

Usage: python tools/micro_wta.py [D]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP
from stereo_reconstruction_cv_tpu.utils.timing import timed_chain


def wta_nat(CT, dST_list, uniqueness_ratio, min_disp, BH, BW):
    """Variant: native cross-lane jnp.min/jnp.sum reductions (keepdims)
    instead of log-D butterflies, narrow (.., 1)/(.., 8) field math."""
    Wc, H, D = CT.shape
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

    def kernel(c_ref, *rest, nds):
        ds_refs = rest[:nds]
        out_ref = rest[nds]
        nd = 5 if nds == 1 else 8
        S = c_ref[...].astype(jnp.int32) * np.int32(nd)
        for ds in ds_refs:
            S = S + ds[...].astype(jnp.int32)
        d_iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, S.ndim - 1)
        big_i = np.int32(1 << 30)
        Dp = 1
        while Dp < D:
            Dp *= 2
        pk = jnp.min(S * np.int32(Dp) + d_iota, axis=-1, keepdims=True)
        minS = pk // np.int32(Dp)          # (BH, BW, 1)
        best = pk - minS * np.int32(Dp)    # (BH, BW, 1)
        far = jnp.abs(d_iota - best) > 1
        mfar = jnp.min(jnp.where(far, S, big_i), axis=-1, keepdims=True)
        bad = mfar * np.int32(100 - uniqueness_ratio) < minS * np.int32(100)
        Sm1 = jnp.sum(jnp.where(d_iota == jnp.maximum(best - 1, 0), S, 0),
                      axis=-1, keepdims=True)
        Sp1 = jnp.sum(jnp.where(d_iota == jnp.minimum(best + 1, np.int32(D - 1)),
                                S, 0), axis=-1, keepdims=True)
        denom = jnp.maximum(Sm1 + Sp1 - 2 * minS, 1).astype(jnp.float32)
        frac = (Sm1 - Sp1).astype(jnp.float32) / (2.0 * denom)
        interior = (best > 0) & (best < D - 1)
        disp = (best.astype(jnp.float32) + jnp.where(interior, frac, 0.0)
                + np.float32(min_disp))
        f = jnp.float32
        fields = (disp, 1.0 - bad.astype(f), best.astype(f), minS.astype(f))
        i8 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW, 8), 2)
        packed = jnp.zeros((BH, BW, 8), f)
        for li, v in enumerate(fields):
            packed = packed + jnp.where(i8 == li, v.astype(f), 0.0)
        out_ref[...] = packed

    return pl.pallas_call(
        functools.partial(kernel, nds=len(dST_list)),
        grid=(Wp // BH, Hp // BW),
        in_specs=[spec] * (1 + len(dST_list)),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(CT, *dST_list)


def wta_variant(CT, dST_list, uniqueness_ratio, min_disp, BH, BW, use_dot):
    Wc, H, D = CT.shape
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

    def kernel(c_ref, *rest, nds):
        ds_refs = rest[:nds]
        out_ref = rest[nds]
        nd = 5 if nds == 1 else 8
        S = c_ref[...].astype(jnp.int32) * np.int32(nd)
        for ds in ds_refs:
            S = S + ds[...].astype(jnp.int32)
        d_iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, S.ndim - 1)
        big_i = np.int32(1 << 30)
        Dp = 1
        while Dp < D:
            Dp *= 2
        packed_key = SP._butterfly_min(S * np.int32(Dp) + d_iota, D)
        minS = packed_key // np.int32(Dp)
        best = packed_key - minS * np.int32(Dp)
        far = jnp.abs(d_iota - best) > 1
        mfar = SP._butterfly_min(jnp.where(far, S, big_i), D)
        bad = mfar * np.int32(100 - uniqueness_ratio) < minS * np.int32(100)
        m1mask = jnp.where(d_iota == jnp.maximum(best - 1, 0), S, 0)
        p1mask = jnp.where(d_iota == jnp.minimum(best + 1, np.int32(D - 1)), S, 0)
        if use_dot:
            ones = jnp.ones((D, 8), jnp.float32)
            stacked = jnp.concatenate([m1mask, p1mask], axis=0).astype(jnp.float32)
            dots = jax.lax.dot_general(
                stacked.reshape(2 * BH * BW, D), ones, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(2, BH, BW, 8)
            Sm1 = dots[0, ..., :1].astype(jnp.int32)
            Sp1 = dots[1, ..., :1].astype(jnp.int32)
        else:
            Sm1 = SP._butterfly_sum(m1mask, D)[..., :1]
            Sp1 = SP._butterfly_sum(p1mask, D)[..., :1]
        denom = jnp.maximum(Sm1 + Sp1 - 2 * minS, 1).astype(jnp.float32)
        frac = (Sm1 - Sp1).astype(jnp.float32) / (2.0 * denom)
        interior = (best > 0) & (best < D - 1)
        disp = (best.astype(jnp.float32) + jnp.where(interior, frac, 0.0)
                + np.float32(min_disp))
        f = jnp.float32
        fields = (disp, 1.0 - bad.astype(f), best.astype(f), minS.astype(f))
        packed = jnp.zeros(S.shape, f)
        for li, v in enumerate(fields):
            packed = packed + jnp.where(d_iota == li, v.astype(f), 0.0)
        out_ref[...] = packed[..., :8]

    return pl.pallas_call(
        functools.partial(kernel, nds=len(dST_list)),
        grid=(Wp // BH, Hp // BW),
        in_specs=[spec] * (1 + len(dST_list)),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(CT, *dST_list)


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["shipped"]
    H, W = 2160, 3840
    Wc = W - D
    rng = np.random.default_rng(0)
    CT = jnp.asarray(rng.integers(0, 20000, (Wc, H, D)), jnp.int16)
    ds = jnp.asarray(rng.integers(0, 40000, (Wc, H, D)).astype(np.uint32), jnp.uint16)
    CT, ds = jax.device_put((CT, ds))
    jax.block_until_ready((CT, ds))

    def t(fn, label):
        try:
            dt = timed_chain(fn, (CT, ds), iters=4)
            print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    for w in which:
        if w == "shipped":
            t(lambda c, s: SP._wta_volume(c, [s], 10, 0, False)[0], "shipped BH8 BW128 dot")
        elif w == "shipped2":
            t(lambda c, s: SP._wta_volume(c, [s, s], 10, 0, False)[0], "shipped 2ds")
        elif w.startswith("nat"):
            parts = w.split(":")
            bh, bw = (int(parts[1]), int(parts[2])) if len(parts) == 3 else (8, 512)
            t(lambda c, s, bh=bh, bw=bw: wta_nat(c, [s], 10, 0, bh, bw)[..., 0],
              f"nat BH{bh} BW{bw}")
        elif w.startswith("2nat"):
            parts = w.split(":")
            bh, bw = (int(parts[1]), int(parts[2])) if len(parts) == 3 else (8, 512)
            t(lambda c, s, bh=bh, bw=bw: wta_nat(c, [s, s], 10, 0, bh, bw)[..., 0],
              f"nat2ds BH{bh} BW{bw}")
        else:
            bh, bw, red = w.split(":")
            bh, bw = int(bh), int(bw)
            t(lambda c, s, bh=bh, bw=bw, red=red:
              wta_variant(c, [s], 10, 0, bh, bw, red == "dot")[..., 0],
              f"variant BH{bh} BW{bw} {red}")


if __name__ == "__main__":
    main()
