"""Decompose the streaming (BASELINE config 5) pipeline cost on this host.

VERDICT r2 weak 2: streaming measured SLOWER than single-pair compute.
This tool times each leg in isolation on the real TPU:

  decode    — native libjpeg 4K grayscale decode, single thread (1 CPU)
  h2d       — jax.device_put of one stacked (2, H, W) uint8 pair
  compute   — SGBM(128) + reproject on resident device arrays
  pipeline  — PrefetchLoader + async dispatch (the actual config 5 loop)

Writes docs/PROFILE_STREAM.json. Run: python tools/profile_stream.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from stereo_reconstruction_cv_tpu import benchmarks as B
from stereo_reconstruction_cv_tpu import native

_REF = "/root/reference/dataset"


def main():
    jax = B._setup_jax()
    import jax.numpy as jnp

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.ops import disparity as DP
    from stereo_reconstruction_cv_tpu.ops import geometry as G

    paths = [
        (os.path.join(_REF, d, "img1.jpg"), os.path.join(_REF, d, "img2.jpg"))
        for d in ("d1", "d3")
    ] * 4
    H, W = 2160, 3840
    out = {"n_pairs": len(paths), "shape": [H, W]}

    # --- decode ---
    imgs = [native.load_image(p, gray=True) for p in paths[0]]
    t0 = time.perf_counter()
    for l, r in paths:
        native.load_image(l, gray=True)
        native.load_image(r, gray=True)
    out["decode_ms_per_pair"] = (time.perf_counter() - t0) / len(paths) * 1e3

    # --- h2d transfer (stacked pair, one put) ---
    pair = np.stack(imgs)
    dev = jax.device_put(pair)
    dev.block_until_ready()
    # A tiny jitted touch forces the data to really be usable on device;
    # fetch a scalar to close the async pipe (relay semantics).
    touch = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    float(np.asarray(touch(dev)))
    t0 = time.perf_counter()
    put = []
    for _ in range(len(paths)):
        put.append(touch(jax.device_put(pair)))
    for o in put:
        float(np.asarray(o))
    dt = (time.perf_counter() - t0) / len(paths)
    out["h2d_ms_per_pair"] = dt * 1e3
    out["h2d_GBps"] = pair.nbytes / dt / 1e9

    # --- compute only (arrays resident) ---
    K, geo = B._rectified_geometry((W, H), 128)
    Q = jnp.asarray(geo.Q, jnp.float32)
    cfg = SGBMConfig(num_disparities=128, num_directions=8, speckle_window_size=0)

    def step(a):
        d, v = DP.sgbm_disparity_auto(a[0], a[1], cfg)
        return jnp.sum(jnp.where(v[..., None], G.reproject_image_to_3d(d, Q), 0.0))

    fn = jax.jit(step)
    float(np.asarray(fn(dev)))
    t0 = time.perf_counter()
    outs = [fn(dev) for _ in range(len(paths))]
    for o in outs:
        float(np.asarray(o))
    out["compute_ms_per_pair"] = (time.perf_counter() - t0) / len(paths) * 1e3

    # --- full pipeline: decode thread + device_put + async dispatch ---
    from stereo_reconstruction_cv_tpu.parallel.prefetch import PrefetchLoader

    warm = PrefetchLoader(paths[:1], batch_size=1, prefetch=1, gray=True)
    for l, r in warm:
        float(np.asarray(fn(jnp.stack([l[0], r[0]]))))
    loader = PrefetchLoader(paths, batch_size=1, prefetch=2, gray=True)
    t0 = time.perf_counter()
    outs = []
    for l, r in loader:
        outs.append(fn(jnp.stack([l[0], r[0]])))
    for o in outs:
        float(np.asarray(o))
    dt = (time.perf_counter() - t0) / len(paths)
    out["pipeline_ms_per_pair"] = dt * 1e3
    out["pipeline_mpix_per_s"] = H * W / dt / 1e6

    ideal = max(out["decode_ms_per_pair"], out["compute_ms_per_pair"],
                out["h2d_ms_per_pair"])
    out["ideal_overlap_ms_per_pair"] = ideal
    out["serial_sum_ms_per_pair"] = (
        out["decode_ms_per_pair"] + out["h2d_ms_per_pair"]
        + out["compute_ms_per_pair"]
    )

    rounded = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in out.items()}
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "PROFILE_STREAM.json")
    with open(path, "w") as f:
        json.dump(rounded, f, indent=1)
    print(json.dumps(rounded, indent=1))


if __name__ == "__main__":
    main()
