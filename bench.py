"""Benchmark driver: dense disparity throughput on the primary config.

Primary metric (BASELINE.json): disparity megapixels/sec at 720p, 128
disparities, full 8-path SGBM with left-right consistency (config 2).
vs_baseline is the speedup over cv2.StereoSGBM (MODE_HH, same parameters)
on this machine's CPU — the reference's own engine on the reference's
workload.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def load_pair(width=1280, height=720):
    """720p stereo pair from the bundled dataset (synthetic shift fallback)."""
    try:
        import cv2

        imL = cv2.imread("/root/reference/dataset/d2/img1.jpg", cv2.IMREAD_GRAYSCALE)
        imR = cv2.imread("/root/reference/dataset/d2/img2.jpg", cv2.IMREAD_GRAYSCALE)
        imL = cv2.resize(imL, (width, height))
        imR = cv2.resize(imR, (width, height))
        return imL, imR
    except Exception:
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, size=(height, width + 32)).astype(np.float32)
        return base[:, 32:].astype(np.uint8), base[:, :-32].astype(np.uint8)


def bench_ours(imL, imR, iters=5):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops.disparity import sgbm_disparity

    cfg = SGBMConfig(num_disparities=128, num_directions=8)
    l = jnp.asarray(imL)
    r = jnp.asarray(imR)
    # Reduce on device, fetch the scalar: block_until_ready alone does not
    # force execution through the remote-TPU relay (verified empirically).
    fn = jax.jit(lambda a, b: jnp.sum(sgbm_disparity(a, b, cfg)[0]))
    float(np.asarray(fn(l, r)))  # compile + warm (real execution)
    float(np.asarray(fn(l, r)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(np.asarray(fn(l, r)))
    dt = (time.perf_counter() - t0) / iters
    return dt


def bench_cv2(imL, imR, iters=3):
    try:
        import cv2

        cfg_p1 = 8 * 3 * 11 * 11
        m = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=128, blockSize=11,
            P1=cfg_p1, P2=4 * cfg_p1, disp12MaxDiff=1, preFilterCap=63,
            uniquenessRatio=10, speckleWindowSize=100, speckleRange=32,
            mode=cv2.STEREO_SGBM_MODE_HH,
        )
        m.compute(imL, imR)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            m.compute(imL, imR)
        return (time.perf_counter() - t0) / iters
    except Exception:
        return None


def main():
    imL, imR = load_pair()
    mpix = imL.shape[0] * imL.shape[1] / 1e6
    dt = bench_ours(imL, imR)
    value = mpix / dt
    dt_cv = bench_cv2(imL, imR)
    vs = (mpix / dt_cv) if dt_cv else None
    print(
        json.dumps(
            {
                "metric": "sgbm_disparity_720p_128disp",
                "value": round(value, 3),
                "unit": "MPix/s",
                "vs_baseline": round(value / vs, 3) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
