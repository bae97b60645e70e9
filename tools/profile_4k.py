"""Per-stage device-time breakdown of the 4K e2e frame (VERDICT r2 item 1).

Times every stage of BASELINE config 3 (calibrated rectify + SGBM(256) +
reproject on a 4K pair) in isolation with the async-dispatch loop from
benchmarks.py, and writes docs/PROFILE_4K.json. Run on the real TPU:

    python tools/profile_4k.py [--disp 256] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from stereo_reconstruction_cv_tpu import benchmarks as B


def timed(step, args, iters):
    """Async-dispatch timing with all outputs reduced to ONE scalar on
    device: keeping `iters` full-size outputs in flight OOMs HBM when a
    stage emits multi-GB volumes (4K x 256 cost volume is 4 GB), and the
    reduction (~5 ms of extra HBM read at 4 GB) also forces execution
    through the relay, where block_until_ready alone does not."""
    import jax
    import jax.numpy as jnp

    def reduced(*a):
        leaves = jax.tree.leaves(step(*a))
        return sum(jnp.sum(x, dtype=jnp.float32) for x in leaves)

    fn = jax.jit(reduced)
    float(np.asarray(fn(*args)))
    float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        float(np.asarray(o))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disp", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    jax = B._setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops import disparity as DP
    from stereo_reconstruction_cv_tpu.ops import geometry as G
    from stereo_reconstruction_cv_tpu.ops import rectify as RC
    from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import cost_volume_pallas
    from stereo_reconstruction_cv_tpu.ops.pallas import sgm_pallas as SP

    imL, imR = B._load_pair("d1")
    H, W = imL.shape
    D = args.disp
    K, geo = B._rectified_geometry((W, H), D)
    cfg = SGBMConfig(num_disparities=D, num_directions=8, speckle_window_size=0)
    Kj = jnp.asarray(K, jnp.float32)
    Q = jnp.asarray(geo.Q, jnp.float32)
    l, r = jnp.asarray(imL), jnp.asarray(imR)
    it = args.iters

    out = {"shape": [H, W], "num_disp": D, "iters": it}

    _path = os.path.join(os.path.dirname(__file__), "..", "docs", "PROFILE_4K.json")

    def flush():
        os.makedirs(os.path.dirname(_path), exist_ok=True)
        rounded = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in out.items()}
        with open(_path, "w") as f:
            json.dump(rounded, f, indent=1)
        print(json.dumps(rounded, indent=1), flush=True)

    # --- rectify ---
    R1 = jnp.asarray(geo.R1, jnp.float32)
    P1 = jnp.asarray(geo.P1, jnp.float32)
    out["rectify_remap_x2_ms"] = 1e3 * timed(
        lambda a, b: (RC.rectify_remap(a, Kj, None, R1, P1),
                      RC.rectify_remap(b, Kj, None, R1, P1)), (l, r), it)
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

    out["prefilter_ms"] = 1e3 * timed(lambda a, b: planes(a, b), (l, r), it)
    flush()

    def cost(a, b):
        sl, sr, rl, rr = planes(a, b)
        return cost_volume_pallas(sl, sr, rl, rr, D, 0)

    out["cost_producer_ms"] = 1e3 * timed(cost, (l, r), it) - out["prefilter_ms"]
    flush()

    C = jax.jit(cost)(l, r)
    C.block_until_ready()
    p1f, p2f = float(cfg.p1), float(cfg.p2)

    # --- individual sweeps ---
    Hc, Wc, _ = C.shape
    full_ok = SP._lane_elems(Wc, D) <= 300_000
    vsweep = SP._sweep_vertical if full_ok else SP._sweep_vertical_tiled
    out["vertical_variant"] = "full" if full_ok else "tiled"
    # HBM residency note: C and each delta volume are ~4 GB at 4K x 256 —
    # materialize at most three at a time (C + dSa + dS2 = 12 GB peak on a
    # 16 GB v5e) and drop dS1 before computing dS2.
    out["vert_fwd_ms"] = 1e3 * timed(
        lambda c: vsweep(c, p1f, p2f, False, False), (C,), it)
    flush()
    out["vert_rev_ms"] = 1e3 * timed(
        lambda c: vsweep(c, p1f, p2f, True, False), (C,), it)
    flush()
    dS1 = jax.jit(lambda c: vsweep(c, p1f, p2f, False, False))(C)
    dS1.block_until_ready()
    out["horiz_fwd_ms"] = 1e3 * timed(
        lambda c, s: SP._sweep_horizontal(c, s, p1f, p2f, False, False), (C, dS1), it)
    flush()
    dSa = jax.jit(
        lambda c, s: SP._sweep_horizontal(c, s, p1f, p2f, False, False))(C, dS1)
    dSa.block_until_ready()
    del dS1
    dS2 = jax.jit(lambda c: vsweep(c, p1f, p2f, True, False))(C)
    dS2.block_until_ready()
    out["horiz_wta_ms"] = 1e3 * timed(
        lambda c, a, b: SP._sweep_horizontal_wta(c, [a, b], p1f, p2f, 10, 0, False),
        (C, dSa, dS2), it)
    flush()
    del dSa, dS2

    # --- full SGBM pieces ---
    disp, valid, best, minS = jax.jit(
        lambda c: SP.sgm_wta_pallas(c, cfg.p1, cfg.p2, 8, 10, 0))(C)
    jax.block_until_ready((disp, valid, best, minS))
    out["lr_check_xla_ms"] = 1e3 * timed(
        lambda b_, m_, d_: DP.lr_check_maps(b_, m_, d_, D, 0, 1),
        (best, minS, disp), it)
    flush()
    from stereo_reconstruction_cv_tpu.ops.pallas.lr_pallas import (
        lr_check_maps_pallas,
    )

    out["lr_check_pallas_ms"] = 1e3 * timed(
        lambda b_, m_, d_: lr_check_maps_pallas(b_, m_, d_, D, 0, 1),
        (best, minS, disp), it)
    flush()

    dfull = jnp.pad(disp, ((0, 0), (D, 0)), constant_values=-1.0)
    vfull = jnp.pad(valid, ((0, 0), (D, 0)), constant_values=False)
    out["speckle_propagate_ms"] = 1e3 * timed(
        lambda d_, v_: DP.speckle_filter(d_, v_, 100, 32.0), (dfull, vfull), it)
    flush()

    out["reproject_ms"] = 1e3 * timed(
        lambda d_, v_: jnp.sum(jnp.where(v_[..., None],
                                         G.reproject_image_to_3d(d_, Q), 0.0)),
        (dfull, vfull), it)
    flush()

    # --- whole SGBM in one jit for cross-check ---
    del C  # the full pipeline materializes its own ~12 GB working set
    out["sgbm_total_ms"] = 1e3 * timed(
        lambda a, b: DP.sgbm_disparity(a, b, cfg)[0].sum(), (l, r), max(2, it // 2))
    flush()

    sweep_bytes = {
        "vert_fwd": 2 + 2, "vert_rev": 2 + 2, "horiz_fwd": 2 + 4, "horiz_wta": 2 + 4,
    }
    cells = Hc * Wc * D
    bw = {}
    for k, bpc in sweep_bytes.items():
        ms = out[f"{k}_ms"]
        bw[k + "_GBps"] = round(cells * bpc / (ms / 1e3) / 1e9, 1)
    out["achieved_bandwidth"] = bw
    out["cells"] = cells

    flush()


if __name__ == "__main__":
    main()
