"""Per-stage device-time breakdown of the 4K e2e frame (VERDICT r2 item 1).

Times every stage of BASELINE config 3 (calibrated rectify + SGBM +
reproject on a 4K pair) with the chained harness (utils/timing.py — the
round-2 async loop floored every number at the ~28 ms relay RTT), and
writes docs/PROFILE_4K.json. Run on the real TPU:

    python tools/profile_4k.py [--disp 256] [--dirs 5] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from stereo_reconstruction_cv_tpu import benchmarks as B
from stereo_reconstruction_cv_tpu.utils.timing import rtt, timed_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disp", type=int, default=256)
    ap.add_argument("--dirs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", default=None,
                    help="WxH resize (e.g. 1280x720); default native 4K")
    ap.add_argument("--out", default=None, help="output json path")
    args = ap.parse_args()

    jax = B._setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops import disparity as DP
    from stereo_reconstruction_cv_tpu.ops import geometry as G
    from stereo_reconstruction_cv_tpu.ops import rectify as RC
    from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP
    from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import cost_volume_pallas
    from stereo_reconstruction_cv_tpu.ops.pallas.lr_pallas import lr_check_maps_pallas

    size = None
    if args.size:
        w, h = (int(v) for v in args.size.lower().split("x"))
        size = (w, h)
    imL, imR = B._load_pair("d1", size)
    H, W = imL.shape
    D = args.disp
    K, geo = B._rectified_geometry((W, H), D)
    cfg = SGBMConfig(num_disparities=D, num_directions=args.dirs,
                     speckle_window_size=0)
    Kj = jnp.asarray(K, jnp.float32)
    Q = jnp.asarray(geo.Q, jnp.float32)
    l, r = jnp.asarray(imL), jnp.asarray(imR)
    it = args.iters

    out = {"shape": [H, W], "num_disp": D, "num_dirs": args.dirs, "iters": it,
           "rtt_ms": round(rtt() * 1e3, 2), "timing": "chained (utils/timing.py)"}

    # Default output is config-specific so profiling one config can't
    # silently overwrite another's committed artifact (bit us in r4).
    _name = ("PROFILE_4K.json" if (args.disp, args.dirs) == (256, 5)
             else f"PROFILE_4K_{args.disp}_{args.dirs}DIR.json")
    _path = args.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", _name)

    def flush():
        os.makedirs(os.path.dirname(_path), exist_ok=True)
        rounded = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in out.items()}
        with open(_path, "w") as f:
            json.dump(rounded, f, indent=1)
        print(json.dumps(rounded, indent=1), flush=True)

    ms = lambda step, a, n=it: 1e3 * timed_chain(step, a, iters=n)

    # --- rectify ---
    R1 = jnp.asarray(geo.R1, jnp.float32)
    P1 = jnp.asarray(geo.P1, jnp.float32)
    out["rectify_remap_x2_ms"] = ms(
        lambda a, b: (RC.rectify_remap(a, Kj, None, R1, P1),
                      RC.rectify_remap(b, Kj, None, R1, P1)), (l, r))
    flush()

    # --- prefilter + cost producer ---
    cap = cfg.pre_filter_cap

    def planes(a, b):
        sl = DP.xsobel_clip(a, cap)
        sr = DP.xsobel_clip(b, cap)
        capv = jnp.int32(cap)
        ps = []
        for p in (sl, sr, a.astype(jnp.int32), b.astype(jnp.int32)):
            ps.append(p.at[:, 0].set(capv).at[:, -1].set(capv))
        return ps

    out["prefilter_ms"] = ms(lambda a, b: planes(a, b), (l, r))
    flush()

    def cost(a, b):
        sl, sr, rl, rr = planes(a, b)
        return cost_volume_pallas(sl, sr, rl, rr, D, 0)

    out["cost_producer_ms"] = ms(cost, (l, r)) - out["prefilter_ms"]
    flush()

    # Maps first, from a fresh (l, r) jit, BEFORE materializing C: the
    # cost volume must stay an internal buffer XLA frees after its last
    # use — held externally alongside the maps program's own 12.75 GB
    # peak, the 5-dir 4K x 256 case exceeds HBM.
    p1f, p2f = float(cfg.p1), float(cfg.p2)
    disp, valid, best, minS = jax.jit(
        lambda a, b: SP.sgm_wta_pallas(cost(a, b), cfg.p1, cfg.p2,
                                       args.dirs, 10, 0))(l, r)
    jax.block_until_ready((disp, valid, best, minS))
    C = jax.jit(cost)(l, r)
    C.block_until_ready()

    # --- individual sweeps (v4 structure) ---
    Hc, Wc, _ = C.shape
    # HBM residency note: C / delta volumes are 4.25 GB each at 4K x 256 —
    # hold at most three (12.75 GB on a 16 GB v5e) at any point.
    out["vert_fwd_ms"] = ms(
        lambda c: SP._vertical_sweep_auto(c, p1f, p2f, False, False), (C,))
    flush()
    out["transpose_C_ms"] = ms(lambda c: jnp.swapaxes(c, 0, 1), (C,))
    flush()
    dsa = jax.jit(lambda c: SP._vertical_sweep_auto(c, p1f, p2f, False, False))(C)
    dsa.block_until_ready()
    CT = jnp.swapaxes(C, 0, 1)
    CT.block_until_ready()
    del C
    dsaT = jnp.swapaxes(dsa, 0, 1)
    dsaT.block_until_ready()
    del dsa
    # Custom chains for the volume-sized steps: timed_chain's eps trick
    # copies its first argument per iteration (+4.25 GB transient at
    # 4K x 256 -> HBM OOM). The accumulate sweeps chain NATURALLY — each
    # iteration's output delta volume is the next one's ds input — and
    # the WTA chain perturbs the small packed output back into nothing.
    import time as _time

    def ms_chain_ht(reverse):
        def chain(ct, s0):
            def body(_, s):
                return SP._sweep_hT(ct, s, p1f, p2f, reverse, False)
            return jnp.sum(jax.lax.fori_loop(0, it, body, s0),
                           dtype=jnp.float32)
        fn = jax.jit(chain)
        float(np.asarray(fn(CT, dsaT)))
        best_t = float("inf")
        for _ in range(2):
            t0 = _time.perf_counter()
            float(np.asarray(fn(CT, dsaT)))
            best_t = min(best_t, _time.perf_counter() - t0)
        return 1e3 * max(best_t - rtt(), 0.0) / it

    out["hT_L_acc_ms"] = ms_chain_ht(False)
    flush()

    # Final sweep with fused WTA (r3): hT_R's delta volume never reaches
    # HBM; the maps chain back into nothing (tiny outputs).
    nd = args.dirs

    # `other` must be a jit ARGUMENT: closing over the 2.1 GB volume bakes
    # it into the program as a constant (hours-long lowering, observed).
    def fused_chain(ct, s0, other):
        def body(_, acc):
            # acc*0 feeds the input so iterations can't be CSEd away.
            eps = (acc * 0.0).astype(jnp.int32).astype(jnp.uint16)
            outs = SP._sweep_hT_wta(
                ct, s0 + eps, other if nd == 8 else None,
                p1f, p2f, nd, 10, 0, False)
            return acc + sum(jnp.sum(x, dtype=jnp.float32) for x in outs)
        return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

    try:
        fnw = jax.jit(fused_chain)
        float(np.asarray(fnw(CT, dsaT, dsaT)))
        best_t = float("inf")
        for _ in range(2):
            t0 = _time.perf_counter()
            float(np.asarray(fnw(CT, dsaT, dsaT)))
            best_t = min(best_t, _time.perf_counter() - t0)
        out["hT_R_wta_fused_ms"] = 1e3 * max(best_t - rtt(), 0.0) / it
    except Exception as e:
        # The it-deep fori_loop graph can crash the remote compile helper
        # at 4K x 256 even though the kernel itself compiles and runs
        # (bench config3 executes it); fall back to single-call timing
        # (one rtt subtraction per call — noisier, flagged in the note).
        fn1 = jax.jit(
            lambda ct, s0, other: sum(
                jnp.sum(x, dtype=jnp.float32)
                for x in SP._sweep_hT_wta(
                    ct, s0, other if nd == 8 else None,
                    p1f, p2f, nd, 10, 0, False)
            )
        )
        float(np.asarray(fn1(CT, dsaT, dsaT)))
        best_t = float("inf")
        for _ in range(4):
            t0 = _time.perf_counter()
            float(np.asarray(fn1(CT, dsaT, dsaT)))
            best_t = min(best_t, _time.perf_counter() - t0)
        out["hT_R_wta_fused_ms"] = 1e3 * max(best_t - rtt(), 0.0)
        out["hT_R_wta_note"] = (
            f"single-call timing (chain harness: {type(e).__name__})")
    flush()
    del CT, dsaT

    # --- maps stages ---
    out["lr_check_pallas_ms"] = ms(
        lambda b_, m_, d_: lr_check_maps_pallas(b_, m_, d_, D, 0, 1),
        (best, minS, disp))
    flush()

    dfull = jnp.pad(disp, ((0, 0), (D, 0)), constant_values=-1.0)
    vfull = jnp.pad(valid, ((0, 0), (D, 0)), constant_values=False)
    cfg_spk = cfg.with_(speckle_window_size=100)
    out["speckle_ms"] = ms(
        lambda d_, v_: DP._speckle(d_, v_, cfg_spk), (dfull, vfull), 4)
    flush()
    out["speckle_sizes_sort_ms"] = ms(
        lambda l_: DP._component_keep_sort(l_, 100),
        (jnp.zeros((H, W - D), jnp.int32),), 4)
    flush()

    out["reproject_ms"] = ms(
        lambda d_, v_: jnp.sum(jnp.where(v_[..., None],
                                         G.reproject_image_to_3d(d_, Q), 0.0)),
        (dfull, vfull))
    flush()

    # --- whole pipelines ---
    out["sgbm_total_ms"] = ms(
        lambda a, b: DP.sgbm_disparity(a, b, cfg)[0].sum(), (l, r), max(2, it // 2))
    flush()

    cfgS = cfg.with_(speckle_window_size=100)
    core = cfgS.with_(speckle_window_size=0)

    def e2e(a, b):
        rl = RC.rectify_remap(a, Kj, None, R1, P1).astype(jnp.uint8)
        rr = RC.rectify_remap(b, Kj, None,
                              jnp.asarray(geo.R2, jnp.float32),
                              jnp.asarray(geo.P2, jnp.float32)).astype(jnp.uint8)
        d, v = DP.sgbm_disparity_auto(rl, rr, core)
        keep = DP._speckle(d, v, cfgS)
        return jnp.sum(jnp.where(keep[..., None], G.reproject_image_to_3d(d, Q), 0.0))

    out["e2e_total_ms"] = ms(e2e, (l, r), max(2, it // 2))
    out["cells"] = Hc * Wc * D
    flush()


if __name__ == "__main__":
    main()
