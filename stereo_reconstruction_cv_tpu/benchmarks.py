"""Benchmark suite: all five BASELINE.json configs (VERDICT r1 item 4).

Emits ONE JSON line per config:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline metric (config 2: 720p full 8-path SGBM at 128 disparities,
same metric name since round 1) prints LAST so harnesses that parse only
the final stdout line track the round-over-round number; the other configs
print before it. `vs_baseline` is the speedup over the reference's own
engine (OpenCV, same parameters) measured on this host's CPU.

Configs (BASELINE.json:6-12):
  1. 720p SAD block-match cost + WTA, 64 disparities     [sad_wta_720p_64disp]
  2. 720p full SGBM 8-path + L-R check, 128 disparities  [sgbm_disparity_720p_128disp]
  3. calibrated rectify+SGBM+reproject e2e, 4K x 256     [e2e_4k_pair_to_cloud]
  4. sparse learned match + batched triangulation d1-d3  [sparse_match_triangulate]
  5. 8-pair 4K batch SGBM + cloud emit, prefetch pipeline [streaming_8pair_4k]

Device-time convention (r3): each step is timed as a CHAIN of dependent
iterations inside one jit (utils/timing.py), fetching one scalar — the
round-2 async-dispatch loop still paid one serial ~28 ms relay round-trip
per fetched scalar, flooring every number at the relay latency. Through
the dev relay `block_until_ready` alone does not force execution, and
fetching full 4K arrays costs seconds of relay (not production) transfer
time. Production deployments stream outputs over PCIe; the relay RTT is
excluded by design. Config 5 (streaming) stays wall-clock: overlapping
host decode with device compute is the thing it measures.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REF_DATA = "/root/reference/dataset"
_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# Reference calibration anchors (main.ipynb cell 1 executed output) used to
# build the calibrated-Q path for the dense benchmarks.
_K_4K = np.array(
    [[2253.71, 0.0, 1929.69], [0.0, 2244.72, 1057.63], [0.0, 0.0, 1.0]],
    dtype=np.float64,
)
_BASELINE_M = 0.140  # dataset/d3/baseline.txt


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


def _timed_device_loop(step, args, iters: int) -> float:
    """Per-iteration device time of `step(*args)` via the chained harness
    (utils/timing.py): `iters` dependent executions inside one jit, one
    scalar fetched, measured relay RTT subtracted."""
    from stereo_reconstruction_cv_tpu.utils.timing import timed_chain

    return timed_chain(step, args, iters=iters)


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _load_pair(name: str, size=None, gray=True):
    """Load a bundled stereo pair (synthetic-shift fallback off-grid)."""
    try:
        import cv2

        flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        imL = cv2.imread(os.path.join(_REF_DATA, name, "img1.jpg"), flag)
        imR = cv2.imread(os.path.join(_REF_DATA, name, "img2.jpg"), flag)
        if size is not None:
            imL = cv2.resize(imL, size)
            imR = cv2.resize(imR, size)
        return imL, imR
    except Exception:
        w, h = size or (1280, 720)
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, size=(h, w + 32)).astype(np.float32)
        return base[:, 32:].astype(np.uint8), base[:, :-32].astype(np.uint8)


def _rectified_geometry(image_size, num_disparities: int):
    """Calibrated rectification geometry for a pair shot with the bundled
    Logitech rig: K from the calibration anchor (scaled to `image_size`),
    near-identity relative pose, 140 mm baseline."""
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.ops import rectify as RC

    W, H = image_size
    s = W / 3840.0
    K = _K_4K.copy()
    K[:2] *= s
    R = np.eye(3)
    T = np.array([-_BASELINE_M, 0.0, 0.0])
    res = RC.stereo_rectify(
        jnp.asarray(K), None, jnp.asarray(K), None, (W, H),
        jnp.asarray(R), jnp.asarray(T), alpha=0.0,
    )
    return K, res


# ---------------------------------------------------------------------------
# Config 1: 720p SAD block-match + WTA, 64 disparities
# ---------------------------------------------------------------------------

def bench_config1(iters=8):
    jax = _setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.ops import disparity as DP

    imL, imR = _load_pair("d2", (1280, 720))
    D, block = 64, 11

    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    if on_tpu:
        from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import (
            cost_volume_pallas,
        )

    def step(l, r):
        sl = DP.xsobel_clip(l, 63)
        sr = DP.xsobel_clip(r, 63)
        rl, rr = l.astype(jnp.int32), r.astype(jnp.int32)
        if on_tpu:  # fused BT cost + 11x11 block sum in one Pallas pass
            C = cost_volume_pallas(sl, sr, rl, rr, D, 0)
        else:
            C = DP.block_sum(DP.bt_cost_volume(sl, sr, rl, rr, D, 0)[:, D:, :], block)
        disp, valid = DP.wta_disparity(C, 0, 0)
        return jnp.sum(jnp.where(valid, disp, 0.0))

    dt = _timed_device_loop(step, (jnp.asarray(imL), jnp.asarray(imR)), iters)
    mpix = imL.shape[0] * imL.shape[1] / 1e6

    dt_cv = None
    try:
        import cv2

        bm = cv2.StereoBM_create(numDisparities=D, blockSize=block)
        bm.compute(imL, imR)
        t0 = time.perf_counter()
        for _ in range(3):
            bm.compute(imL, imR)
        dt_cv = (time.perf_counter() - t0) / 3
    except Exception:
        pass
    return {
        "metric": "sad_wta_720p_64disp",
        "value": round(mpix / dt, 3),
        "unit": "MPix/s",
        "vs_baseline": round(dt_cv / dt, 3) if dt_cv else None,
    }


# ---------------------------------------------------------------------------
# Config 2 (headline): 720p full 8-path SGBM + L-R check, 128 disparities
# ---------------------------------------------------------------------------

def bench_config2(iters=5):
    jax = _setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops.disparity import sgbm_disparity

    imL, imR = _load_pair("d2", (1280, 720))
    cfg = SGBMConfig(num_disparities=128, num_directions=8)

    def step(l, r):
        return jnp.sum(sgbm_disparity(l, r, cfg)[0])

    dt = _timed_device_loop(step, (jnp.asarray(imL), jnp.asarray(imR)), iters)
    mpix = imL.shape[0] * imL.shape[1] / 1e6

    dt_cv = None
    try:
        import cv2

        p1 = 8 * 3 * 11 * 11
        m = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=128, blockSize=11,
            P1=p1, P2=4 * p1, disp12MaxDiff=1, preFilterCap=63,
            uniquenessRatio=10, speckleWindowSize=100, speckleRange=32,
            mode=cv2.STEREO_SGBM_MODE_HH,
        )
        m.compute(imL, imR)
        t0 = time.perf_counter()
        for _ in range(3):
            m.compute(imL, imR)
        dt_cv = (time.perf_counter() - t0) / 3
    except Exception:
        pass
    return {
        "metric": "sgbm_disparity_720p_128disp",
        "value": round(mpix / dt, 3),
        "unit": "MPix/s",
        "dirs": 8,  # explicit mode (ADVICE r4) — full 8-path MODE_HH
        "vs_baseline": round(dt_cv / dt, 3) if dt_cv else None,
    }


# ---------------------------------------------------------------------------
# Config 3: calibrated rectify + SGBM + 3D reprojection, 4K x 256 disparities
# ---------------------------------------------------------------------------

def bench_config3(iters=3):
    jax = _setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops import disparity as DP
    from stereo_reconstruction_cv_tpu.ops import geometry as G
    from stereo_reconstruction_cv_tpu.ops import rectify as RC

    imL, imR = _load_pair("d1")
    H, W = imL.shape

    # LIVE calibration (r5, VERDICT r4 item 6): run the real Zhang+LM
    # pipeline over the 44 bundled 4K boards ONCE — rig setup, outside the
    # per-pair loop, exactly as the reference notebook runs
    # cv2.calibrateCamera before its dense cells (main.ipynb cell 1 :206
    # +59-61) — and use ITS K for the rectification geometry. Wall-clock
    # `calib_s` rides the e2e metric line. Anchor-K fallback if the
    # calibration data is absent (synthetic environments).
    K_live, calib_s, calib_err = None, None, None
    calib_dir = "/root/reference/calibration_data_logitech_3840x2160"
    if os.path.isdir(calib_dir):
        try:
            from stereo_reconstruction_cv_tpu.pipeline import stages as ST

            t0 = time.perf_counter()
            calib = ST.calibrate(calib_dir)
            if "error" not in calib:
                calib_s = round(time.perf_counter() - t0, 2)
                K_live = np.asarray(calib["K"], np.float64)
                calib_err = round(float(calib["mean_error"]), 4)
        except Exception:
            pass

    def geo_for(K, alpha):
        import jax.numpy as jnp

        from stereo_reconstruction_cv_tpu.ops import rectify as RC_

        res = RC_.stereo_rectify(
            jnp.asarray(K), None, jnp.asarray(K), None, (W, H),
            jnp.asarray(np.eye(3)), jnp.asarray([-_BASELINE_M, 0.0, 0.0]),
            alpha=alpha,
        )
        return tuple(
            jnp.asarray(a, jnp.float32)
            for a in (res.R1, res.P1, res.R2, res.P2, res.Q)
        )

    if K_live is None:
        K = _K_4K.copy()
    else:
        K = K_live
    # 5 directions == cv2's default MODE_SGBM, the mode the reference
    # notebook actually runs (main.ipynb cell 10 passes no mode flag);
    # the CPU baseline below uses the same default.
    cfg = SGBMConfig(num_disparities=256, num_directions=5)
    core = cfg.with_(speckle_window_size=0)
    Kj = jnp.asarray(K, jnp.float32)

    # Geometry is CLOSED OVER (compile-time rig constants), one program
    # per alpha — the same convention as the cv2 baseline below, which
    # precomputes its initUndistortRectifyMap outside the timed loop:
    # rectify maps are per-rig constants in any production deployment.
    # (Passing R/P/Q as jit arguments forces the map generation into every
    # frame and measured +114 ms/frame, r5.)
    def make_e2e(g):
        R1, P1, R2, P2, Q = g

        def e2e(l, r):
            rl = RC.rectify_remap(l, Kj, None, R1, P1).astype(jnp.uint8)
            rr = RC.rectify_remap(r, Kj, None, R2, P2).astype(jnp.uint8)
            d, v = DP.sgbm_disparity_auto(rl, rr, core)
            keep = DP._speckle(d, v, cfg)  # slices the invalid margin
            return jnp.sum(
                jnp.where(keep[..., None], G.reproject_image_to_3d(d, Q), 0.0)
            )

        return e2e

    l, r = jnp.asarray(imL), jnp.asarray(imR)
    dt = _timed_device_loop(make_e2e(geo_for(K, 0.0)), (l, r), iters)
    dt_a1 = _timed_device_loop(make_e2e(geo_for(K, 1.0)), (l, r), iters)
    mpix = H * W / 1e6

    # Primary-metric companion: raw 4K SGBM MPix/s at 128 disparities
    # (BASELINE.json metric line: "disparity MPix/s at 720p/4K (128 disp)").
    # Headline mode is 5 directions == cv2's default MODE_SGBM, the mode
    # the reference notebook actually runs (main.ipynb cell 10 passes no
    # mode flag); the full-8-path number is emitted alongside for
    # comparability with BASELINE config 2 (explicitly "full 8-path") and
    # with the round-1/2 records. Both carry a "mode" field.
    cfg128 = cfg.with_(num_disparities=128, num_directions=5,
                       speckle_window_size=0)
    dt128 = _timed_device_loop(
        lambda a, b: jnp.sum(DP.sgbm_disparity_auto(a, b, cfg128)[0]), (l, r), 3
    )
    dt128_8 = _timed_device_loop(
        lambda a, b: jnp.sum(
            DP.sgbm_disparity_auto(a, b, cfg128.with_(num_directions=8))[0]
        ),
        (l, r), 3,
    )

    dt_cv = dt_cv_a1 = None
    try:
        import cv2

        p1 = 8 * 3 * 11 * 11
        m = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=256, blockSize=11,
            P1=p1, P2=4 * p1, disp12MaxDiff=1, preFilterCap=63,
            uniquenessRatio=10, speckleWindowSize=100, speckleRange=32,
        )

        def cv_e2e(alpha):
            R1, R2, P1_, P2_, Qc, _, _ = cv2.stereoRectify(
                K, None, K, None, (W, H), np.eye(3),
                np.array([[-_BASELINE_M], [0.0], [0.0]]), alpha=alpha,
            )
            m1 = cv2.initUndistortRectifyMap(K, None, R1, P1_, (W, H), cv2.CV_32FC1)
            m2 = cv2.initUndistortRectifyMap(K, None, R2, P2_, (W, H), cv2.CV_32FC1)
            t0 = time.perf_counter()
            rl = cv2.remap(imL, m1[0], m1[1], cv2.INTER_LINEAR)
            rr = cv2.remap(imR, m2[0], m2[1], cv2.INTER_LINEAR)
            d = m.compute(rl, rr).astype(np.float32) / 16.0
            cv2.reprojectImageTo3D(d, Qc)
            return time.perf_counter() - t0

        dt_cv = cv_e2e(0.0)
        dt_cv_a1 = cv_e2e(1.0)
    except Exception:
        pass
    # Metric names (ADVICE r3): `sgbm_disparity_4k_128disp` stays bound to
    # full 8-path MODE_HH — the meaning it carried in the r1/r2 records —
    # so round-over-round parsers compare like with like; the 5-dir
    # MODE_SGBM row (cv2's own default, what the reference notebook runs)
    # is emitted under an explicit `_5dir` suffix.
    return [
        {
            "metric": "sgbm_disparity_4k_128disp",
            "value": round(mpix / dt128_8, 3),
            "unit": "MPix/s",
            "dirs": 8,
            "mode": "MODE_HH (full 8-path, same mode as the r1/r2 records)",
            "vs_baseline": None,
        },
        {
            "metric": "sgbm_disparity_4k_128disp_5dir",
            "value": round(mpix / dt128, 3),
            "unit": "MPix/s",
            "dirs": 5,
            "mode": "MODE_SGBM (5-dir, cv2/reference default)",
            "vs_baseline": None,
        },
        {
            "metric": "e2e_4k_pair_to_cloud",
            "value": round(dt, 4),
            "unit": "s/pair",
            "dirs": 5,
            "fps": round(1.0 / dt, 3),
            "mpix_per_s": round(mpix / dt, 3),
            # Rig setup (one-time): live Zhang+LM calibration over the 44
            # bundled boards whose K feeds the rectify geometry above;
            # None = fell back to the anchor K (data absent / failed).
            "calib_s": calib_s,
            "calib_mean_reproj_px": calib_err,
            "vs_baseline": round(dt_cv / dt, 3) if dt_cv else None,
        },
        {
            # The reference's actual rectification setting (gui.py:157,
            # cell 7 +18-20): alpha=1.0 keeps all source pixels. Same
            # compiled program, different geometry arguments.
            "metric": "e2e_4k_pair_to_cloud_alpha1",
            "value": round(dt_a1, 4),
            "unit": "s/pair",
            "dirs": 5,
            "fps": round(1.0 / dt_a1, 3),
            "vs_baseline": round(dt_cv_a1 / dt_a1, 3) if dt_cv_a1 else None,
        },
    ]


# ---------------------------------------------------------------------------
# Config 4: sparse learned match + batched triangulation on dataset/d1-d3
# ---------------------------------------------------------------------------

def bench_config4(iters=5):
    jax = _setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.models import xfeat as XF
    from stereo_reconstruction_cv_tpu.ops import geometry as G
    from stereo_reconstruction_cv_tpu.ops import matching as MT

    size = (960, 536)  # multiple-of-8 working resolution for the net
    pairs = [_load_pair(d, size) for d in ("d1", "d2", "d3")]

    model = XF.XFeatNet()
    # Highest-versioned shipped checkpoint == the evaluated best
    # (docs/XFEAT_EVAL.json), matching cli._default_learned_checkpoint.
    # Params template inits at a tiny FIXED shape: conv param shapes are
    # input-size independent, and each distinct compiled program costs
    # ~60 s through the dev relay (r4; full-size init alone burned a
    # minute of the r3 driver budget).
    import glob as _glob

    cands = sorted(_glob.glob(os.path.join(_REPO_ROOT, "checkpoints", "xfeat_v*")))
    state, _ = XF.create_train_state(jax.random.PRNGKey(0), model, (64, 96))
    params = state.params
    if cands:
        from stereo_reconstruction_cv_tpu.models import checkpoint as CK

        params = CK.load_params(cands[-1], like=params)

    K, geo = _rectified_geometry(size, 0)
    P1 = jnp.asarray(geo.P1, jnp.float32)
    P2 = jnp.asarray(geo.P2, jnp.float32)
    maxk = 1024

    def step(l, r):
        # One batched net forward for the pair (models.xfeat.detect_pair,
        # r4): the per-image B=1 forwards underfed the MXU and paid every
        # launch twice — the driver-measured 97.4 ms/pair of r3.
        f1, f2 = XF.detect_pair(params, model, l, r, maxk)
        res = MT.match_learned(f1.descriptors, f2.descriptors)
        p1, p2, w = MT.gather_correspondences(f1.keypoints, f2.keypoints, res)
        pts = G.triangulate_points(P1, P2, p1, p2)
        return jnp.sum(jnp.where(w[:, None], pts, 0.0))

    dts = [
        _timed_device_loop(step, (jnp.asarray(l), jnp.asarray(r)), iters)
        for l, r in pairs
    ]
    dt = sum(dts) / len(dts)

    dt_cv = None
    try:
        import cv2

        sift = cv2.SIFT_create()
        flann = cv2.FlannBasedMatcher({"algorithm": 1, "trees": 5}, {"checks": 50})
        Pn1 = np.asarray(geo.P1, np.float64)
        Pn2 = np.asarray(geo.P2, np.float64)

        def cv_pair(l, r):
            k1, d1 = sift.detectAndCompute(l, None)
            k2, d2 = sift.detectAndCompute(r, None)
            mm = flann.knnMatch(d1, d2, k=2)
            good = [m for m, n in mm if m.distance < 0.75 * n.distance]
            if good:
                a = np.float64([k1[m.queryIdx].pt for m in good]).T
                b = np.float64([k2[m.trainIdx].pt for m in good]).T
                cv2.triangulatePoints(Pn1, Pn2, a, b)

        for l, r in pairs:
            cv_pair(l, r)
        t0 = time.perf_counter()
        for _ in range(2):
            for l, r in pairs:
                cv_pair(l, r)
        dt_cv = (time.perf_counter() - t0) / (2 * len(pairs))
    except Exception:
        pass
    return {
        "metric": "sparse_match_triangulate",
        "value": round(dt * 1000, 3),
        "unit": "ms/pair",
        "pairs_per_s": round(1.0 / dt, 3),
        "vs_baseline": round(dt_cv / dt, 3) if dt_cv else None,
    }


# ---------------------------------------------------------------------------
# Config 5: 8-pair 4K batch SGBM + point-cloud emit, pipelined prefetch
# ---------------------------------------------------------------------------

def bench_config5():
    """Streaming: 8 DISTINCT 4K pairs through decode -> H2D -> SGBM +
    cloud emit, pipelined.

    r5 (VERDICT r4 item 7): the primary `value` is now the true pipeline
    rate over 8 GENUINE host->HBM transfers (n_h2d_events) overlapped
    with host decode/augment and device compute — the r4 run cycled
    mostly pre-staged device buffers. The 8 pairs are the two bundled 4K
    pairs plus six photometric variants (distinct buffers, so every
    transfer really crosses the link). `compute_only_mpix_per_s`
    preserves the r4 `value` semantics (resident device buffers — what a
    production PCIe host would see, since PCIe moves a 4K pair in ~2 ms
    where this dev tunnel needs ~0.3 s at the recorded `h2d_MBps`)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops import disparity as DP
    from stereo_reconstruction_cv_tpu.ops import geometry as G
    from stereo_reconstruction_cv_tpu.parallel.prefetch import _decode

    base_paths = [
        (os.path.join(_REF_DATA, d, "img1.jpg"), os.path.join(_REF_DATA, d, "img2.jpg"))
        for d in ("d1", "d3")
    ]
    H, W = 2160, 3840
    K, geo = _rectified_geometry((W, H), 128)
    Q = jnp.asarray(geo.Q, jnp.float32)
    cfg = SGBMConfig(num_disparities=128, num_directions=8, speckle_window_size=0)

    def pair_step(ab):
        d, v = DP.sgbm_disparity_auto(ab[0], ab[1], cfg)
        return jnp.sum(jnp.where(v[..., None], G.reproject_image_to_3d(d, Q), 0.0))

    step = jax.jit(pair_step)

    def decode_pair(pr):
        return np.stack([_decode(pr[0], True), _decode(pr[1], True)])

    bases = [decode_pair(pr) for pr in base_paths]

    n_pairs = 8

    def make_pair(i):
        """Distinct frame i: bundled pair or a photometric variant (gain
        jitter keeps SGBM semantics; the buffer is distinct so its H2D
        transfer is genuine)."""
        b = bases[i % 2]
        if i < 2:
            return b
        gain = 1.0 + 0.03 * (i // 2)
        return np.clip(b.astype(np.float32) * gain, 0, 255).astype(np.uint8)

    # Warm compile + one staged buffer outside the timed loop.
    x0 = jax.device_put(make_pair(0))
    float(np.asarray(step(x0)))

    # Pipelined loop: dispatch compute for the resident pair, then
    # decode/augment the NEXT pair on the host and push it H2D while the
    # device executes — steady state = max(decode+H2D, compute). Single
    # host core: serial decode is deliberate (a thread pool convoys with
    # the relay client's polling; r4 note).
    t0 = time.perf_counter()
    outs = []
    x = x0
    for i in range(n_pairs):
        outs.append(step(x))
        if i + 1 < n_pairs:
            x = jax.device_put(make_pair(i + 1))  # async H2D, overlaps step
    for o in outs:
        float(np.asarray(o))
    dt_pipe = (time.perf_counter() - t0) / n_pairs
    n_h2d = n_pairs - 1 + 1  # staged first pair + 7 in-loop transfers

    # Compute-only rate (r4 `value` semantics): resident device buffers.
    staged = [x0, jax.device_put(make_pair(1))]
    float(np.asarray(step(staged[1])))
    t0 = time.perf_counter()
    outs = [step(staged[i % 2]) for i in range(n_pairs)]
    for o in outs:
        float(np.asarray(o))
    dt_dev = (time.perf_counter() - t0) / n_pairs

    # Tunnel bandwidth probe (auditability of the pipeline number).
    t0 = time.perf_counter()
    xp = jax.device_put(bases[0])
    float(np.asarray(jnp.sum(xp, dtype=jnp.float32)))
    h2d = bases[0].nbytes / (time.perf_counter() - t0) / 1e6

    mpix = H * W / 1e6
    return {
        "metric": "streaming_8pair_4k",
        "value": round(mpix / dt_pipe, 3),
        "unit": "MPix/s",
        "dirs": 8,
        "pairs_per_s": round(1.0 / dt_pipe, 3),
        "n_pairs": n_pairs,
        "n_h2d_events": n_h2d,
        "compute_only_mpix_per_s": round(mpix / dt_dev, 3),
        "h2d_MBps": round(h2d, 1),
        "host_cpus": os.cpu_count(),
        "note": ("value = decode+H2D+compute pipeline over distinct buffers "
                 "through the dev relay tunnel; compute_only = r4 semantics"),
        "vs_baseline": None,
    }


_CONFIGS = {1: bench_config1, 2: bench_config2, 3: bench_config3,
            4: bench_config4, 5: bench_config5}
# Round-4 ordering (VERDICT r3 item 1): the HEADLINE (config 2) runs and
# emits FIRST — a harness timeout partway through the suite can no longer
# erase the primary metric — and its stored result is re-emitted LAST so
# final-stdout-line parsers still read it.
_DEFAULT_ORDER = (2, 1, 4, 3, 5)

# Per-config wall-clock caps (seconds). A config that overruns its cap is
# killed via SIGALRM and emits an {"error": "budget"} line; the suite moves
# on. Caps sized ~3x the measured r4 runtimes on the dev host (warm
# persistent compile cache, tools/warm_bench_cache.py).
_CAPS = {1: 90, 2: 150, 3: 330, 4: 150, 5: 300}
# Cap multiplier for cache-WARMING runs after kernel changes (first
# compiles through the dev relay are serialized at ~60-500 s each and
# must complete to land in /root/.jax_cache — an alarm kill mid-compile
# caches nothing). The driver's run uses the unscaled caps and hits the
# warmed cache. Usage: STEREO_BENCH_CAP_SCALE=10 python bench.py
_CAP_SCALE = float(os.environ.get("STEREO_BENCH_CAP_SCALE", "1"))


class _Budget(BaseException):
    # BaseException, NOT Exception: the configs' own broad
    # `except Exception` guards (cv2-baseline blocks) must not swallow
    # the SIGALRM budget raise; main() catches _Budget explicitly.
    pass


def _run_capped(fn, cap_s: float):
    """Run fn() under a hard SIGALRM deadline (main thread only).

    The timer REPEATS every 5 s after the deadline: a single alarm can
    land inside a context that swallows the exception (observed r4: the
    raise inside jax's GC callback printed "Exception ignored" and the
    config ran on), so further alarms keep firing until one propagates.

    The timer is disarmed INSIDE the try, immediately after fn() returns
    (ADVICE r4): disarming only in `finally` left a window where a
    pending alarm could fire after a completed config returned and
    mislabel its results as a budget kill."""
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return fn()  # SIGALRM handlers only fire on the main thread

    def handler(signum, frame):
        raise _Budget()

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, max(1.0, float(cap_s)), 5.0)
    try:
        result = fn()
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        return result
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old)


def _relay_alive(timeout_s: float = 90.0) -> bool:
    """One trivial jitted round-trip in a SUBPROCESS (isolates the jax
    client from an alarm-killed device call): ~15-30 s when the dev relay
    is healthy, timeout when it is in one of its multi-minute stalls."""
    import subprocess

    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "print(float(np.asarray(jax.jit(lambda x: x + 1.0)"
            "(jnp.float32(0.0)))))")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except Exception:
        return False


def main(configs=None) -> int:
    if configs is None:
        env = os.environ.get("STEREO_BENCH_CONFIGS")
        configs = [int(c) for c in env.split(",")] if env else list(_DEFAULT_ORDER)
    else:
        configs = [int(c) for c in configs]
    # Total suite budget: keep comfortably inside the driver's harness
    # timeout (round 3 was rc=124 with only 2 of 6 lines out).
    total_budget = float(os.environ.get("STEREO_BENCH_BUDGET_S", "600"))
    t0 = time.monotonic()
    # Relay-liveness gate (r5): during a relay stall every config starves
    # under its cap and the whole budget burns into a dead link. With a
    # warm cache the suite needs ~400 s of LIVE relay, so spend up to
    # half the budget waiting for a live window first. (Skipped on CPU
    # runs — the tests' environment sets JAX_PLATFORMS=cpu.)
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        while not _relay_alive(90.0):
            waited = time.monotonic() - t0
            _emit({"relay": "stalled", "waited_s": round(waited, 1)})
            if waited > 0.5 * total_budget:
                break
    headline = None
    starved = []

    def run_one(c, retry=False):
        nonlocal headline
        remaining = total_budget - (time.monotonic() - t0)
        if remaining < 15:
            _emit({"metric": f"config{c}", "skipped": "suite budget exhausted",
                   "budget_s": total_budget})
            return
        try:
            out = _run_capped(_CONFIGS[c],
                              min(_CAPS.get(c, 120) * _CAP_SCALE, remaining))
            for obj in out if isinstance(out, list) else [out]:
                _emit(obj)
                if obj.get("metric") == "sgbm_disparity_720p_128disp":
                    headline = obj
        except _Budget:
            _emit({"metric": f"config{c}", "error": "budget",
                   "cap_s": _CAPS.get(c, 120), "retry": retry})
            if not retry:
                starved.append(c)
        except Exception as e:  # one config failing must not hide the rest
            _emit({"metric": f"config{c}", "error": f"{type(e).__name__}: {e}"[:300]})

    for c in configs:
        run_one(c)
    # Transient-relay retry pass (r5): the dev relay intermittently stalls
    # for minutes (observed: a trivial jit round-trip exceeding 300 s with
    # a warm cache), starving configs under their caps. One retry with the
    # leftover budget recovers the lines once the relay unsticks.
    for c in starved:
        run_one(c, retry=True)
    if headline is not None and len(configs) > 1:
        _emit(headline)  # headline re-emitted last for tail-line parsers
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
