"""Hardware parity artifact (VERDICT r1 item 9).

Runs the Pallas SGM kernels against the exact XLA scan reference ON THE
REAL TPU and writes docs/HW_PARITY.json recording bit-exactness, shapes,
and timings — committed once per round so kernel claims are backed by a
hardware artifact, not just interpret-mode CI (tests run interpret=True on
CPU; this is the on-device proof).

Usage: python tools/hw_parity.py [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))


def main(out_path="docs/HW_PARITY.json"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.ops import disparity as DP
    from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import cost_volume_pallas
    from stereo_reconstruction_cv_tpu.ops.pallas.sgm_pallas import (
        _sweep_vertical,
        _sweep_vertical_tiled,
        sgm_aggregate_pallas,
    )

    rng = np.random.default_rng(0)
    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "cases": [],
    }

    def record(name, shape, ok, max_abs_diff, dt_pallas=None, dt_xla=None):
        report["cases"].append(
            {
                "case": name,
                "shape": list(shape),
                "bit_exact": bool(ok),
                "max_abs_diff": float(max_abs_diff),
                "pallas_ms": round(dt_pallas * 1000, 3) if dt_pallas else None,
                "xla_ms": round(dt_xla * 1000, 3) if dt_xla else None,
            }
        )
        print(f"{name} {shape}: bit_exact={ok} maxdiff={max_abs_diff}", flush=True)

    def timed(fn, *args, iters=3):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)  # force
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        return out, (time.perf_counter() - t0) / iters

    # --- SGM aggregation: Pallas sweeps vs exact XLA scans -----------------
    for (H, W, D), ndirs in [((144, 320, 64), 8), ((240, 512, 128), 5)]:
        C = jnp.asarray(rng.integers(0, 20000, size=(H, W, D)), jnp.int32)
        p1, p2 = 8 * 3 * 121, 32 * 3 * 121
        dirs = DP.DIRS_8 if ndirs == 8 else DP.DIRS_5
        f_pal = jax.jit(lambda c: sgm_aggregate_pallas(c, p1, p2, ndirs))
        f_xla = jax.jit(lambda c: DP.sgm_aggregate(c, p1, p2, dirs, None, 32))
        out_p, dt_p = timed(f_pal, C)
        out_x, dt_x = timed(f_xla, C)
        diff = np.abs(np.asarray(out_p, np.int64) - np.asarray(out_x, np.int64))
        record(f"sgm_aggregate_{ndirs}dir", (H, W, D), diff.max() == 0,
               diff.max(), dt_p, dt_x)

    # --- Column-tiled vertical sweep vs full-width (the 4K path) ----------
    for shape in [(64, 256, 64), (48, 640, 128)]:
        H, W, D = shape
        C = jnp.asarray(rng.integers(0, 20000, size=shape), jnp.int16)
        p1f, p2f = 2904.0, 11616.0
        f_full = jax.jit(lambda c: _sweep_vertical(
            c, p1f, p2f, reverse=False, interpret=False))
        f_tile = jax.jit(lambda c: _sweep_vertical_tiled(
            c, p1f, p2f, reverse=False, interpret=False, tile_width=64))
        out_f, dt_f = timed(f_full, C)
        out_t, dt_t = timed(f_tile, C)
        diff = np.abs(np.asarray(out_f) - np.asarray(out_t))
        record("vertical_tiled_vs_full", shape, diff.max() == 0, diff.max(),
               dt_t, dt_f)

    # --- Fused Pallas cost volume vs XLA BT + box sum ----------------------
    for (H, W, D, mind) in [(48, 400, 64, 0), (32, 360, 128, 0)]:
        l = jnp.asarray(rng.integers(0, 255, size=(H, W)), jnp.uint8)
        r = jnp.asarray(rng.integers(0, 255, size=(H, W)), jnp.uint8)
        sl = DP.xsobel_clip(l, 63)
        sr = DP.xsobel_clip(r, 63)
        rl, rr = l.astype(jnp.int32), r.astype(jnp.int32)
        x0 = mind + D
        f_pal = jax.jit(lambda a, b, c, d: cost_volume_pallas(a, b, c, d, D, mind))
        f_xla = jax.jit(lambda a, b, c, d: DP.block_sum(
            DP.bt_cost_volume(a, b, c, d, D, mind)[:, x0:, :], 11))
        out_p, dt_p = timed(f_pal, sl, sr, rl, rr)
        out_x, dt_x = timed(f_xla, sl, sr, rl, rr)
        diff = np.abs(np.asarray(out_p, np.int64) - np.asarray(out_x, np.int64))
        record("cost_volume_fused", (H, W, D), diff.max() == 0, diff.max(),
               dt_p, dt_x)

    # --- Pallas LR check vs the XLA maps loop ------------------------------
    from stereo_reconstruction_cv_tpu.ops.pallas.lr_pallas import (
        lr_check_maps_pallas,
    )

    for (H, Wc, D) in [(120, 512, 64), (96, 640, 128)]:
        best = jnp.asarray(rng.integers(0, D, size=(H, Wc)), jnp.int32)
        minS = jnp.asarray(rng.integers(0, 100000, size=(H, Wc)), jnp.int32)
        disp = best.astype(jnp.float32) + jnp.asarray(
            rng.uniform(-0.499, 0.499, size=(H, Wc)), jnp.float32)
        f_p = jax.jit(lambda b, m, d: lr_check_maps_pallas(b, m, d, D, 0, 1))
        f_x = jax.jit(lambda b, m, d: DP.lr_check_maps(b, m, d, D, 0, 1))
        out_p, dt_p = timed(f_p, best, minS, disp)
        out_x, dt_x = timed(f_x, best, minS, disp)
        diff = (np.asarray(out_p) != np.asarray(out_x)).sum()
        record("lr_check_pallas", (H, Wc, D), diff == 0, diff, dt_p, dt_x)

    # --- Fused final-sweep + WTA vs XLA aggregate + WTA + lr maps ---------
    from stereo_reconstruction_cv_tpu.ops.pallas.sgm_pallas import sgm_wta_pallas

    for (H, W, D), ndirs in [((96, 320, 64), 5), ((64, 384, 128), 8)]:
        C = jnp.asarray(rng.integers(0, 20000, size=(H, W, D)), jnp.int32)
        p1, p2 = 8 * 3 * 121, 32 * 3 * 121
        dirs = DP.DIRS_8 if ndirs == 8 else DP.DIRS_5
        f_pal = jax.jit(lambda c: sgm_wta_pallas(c, p1, p2, ndirs, 10, 0))
        def f_ref(c):
            S = DP.sgm_aggregate(c, p1, p2, dirs, None, 32)
            d_, v_ = DP.wta_disparity(S, 0, 10)
            return d_, v_, jnp.argmin(S, -1).astype(jnp.int32), jnp.min(S, -1)
        out_p, dt_p = timed(f_pal, C)
        out_x, dt_x = timed(jax.jit(f_ref), C)
        diff = max(
            float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
            for a, b in zip(out_p, out_x)
        )
        record(f"wta_fused_sweep_{ndirs}dir", (H, W, D), diff == 0, diff,
               dt_p, dt_x)

    # --- Pallas speckle flood rounds vs the XLA segmented min-flood -------
    for (H, W) in [(240, 512), (360, 640)]:
        disp = jnp.asarray(rng.random((H, W)) * 60, jnp.float32)
        valid = jnp.asarray(rng.random((H, W)) >= 0.4)
        disp = jnp.where(valid, disp, 0.0)
        f_p = jax.jit(lambda d, v: DP.speckle_filter(d, v, 50, 5.0,
                                                     use_pallas=True))
        f_x = jax.jit(lambda d, v: DP.speckle_filter(d, v, 50, 5.0,
                                                     use_pallas=False))
        out_p, dt_p = timed(f_p, disp, valid)
        out_x, dt_x = timed(f_x, disp, valid)
        diff = (np.asarray(out_p) != np.asarray(out_x)).sum()
        record("speckle_flood_pallas", (H, W), diff == 0, diff, dt_p, dt_x)

    # --- Full SGBM Pallas backend vs XLA backend on a real pair -----------
    try:
        import cv2

        imL = cv2.resize(cv2.imread(
            "/root/reference/dataset/d2/img1.jpg", 0), (640, 360))
        imR = cv2.resize(cv2.imread(
            "/root/reference/dataset/d2/img2.jpg", 0), (640, 360))
        from stereo_reconstruction_cv_tpu.config import SGBMConfig

        cfg_p = SGBMConfig(num_disparities=64, backend="pallas",
                           speckle_window_size=0)
        cfg_x = cfg_p.with_(backend="xla")
        f_p = jax.jit(lambda a, b: DP.sgbm_disparity(a, b, cfg_p))
        f_x = jax.jit(lambda a, b: DP.sgbm_disparity(a, b, cfg_x))
        (dp_, vp), dt_p = timed(f_p, jnp.asarray(imL), jnp.asarray(imR))
        (dx_, vx), dt_x = timed(f_x, jnp.asarray(imL), jnp.asarray(imR))
        dp_, vp, dx_, vx = map(np.asarray, (dp_, vp, dx_, vx))
        same_mask = (vp == vx).mean()
        both = vp & vx
        diff = np.abs(dp_[both] - dx_[both]).max() if both.any() else 0.0
        record("sgbm_full_pallas_vs_xla", imL.shape + (64,),
               (same_mask == 1.0) and (diff == 0), float(diff), dt_p, dt_x)
        report["sgbm_valid_mask_agreement"] = float(same_mask)
    except Exception as e:
        report["sgbm_error"] = str(e)

    report["all_bit_exact"] = all(c["bit_exact"] for c in report["cases"])
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}: all_bit_exact={report['all_bit_exact']}")
    return 0 if report["all_bit_exact"] else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
