"""Classical feature detection/description, SIFT-compatible semantics.

Replaces cv2.SIFT_create().detectAndCompute (reference gui.py:112-114,
226-227; tunable contrastThreshold gui.py:212) for the geometry pipeline:
DoG scale-space extrema with cv2's absolute-contrast threshold semantics
(ops/sift.py; the round-1 multi-scale Harris stand-in remains available
as detector='harris'), dominant-orientation assignment, and a SIFT-like
4x4x8 gradient-histogram descriptor (128-d, L2-normalized, 0.2-clipped).
The learned XFeat path (models/xfeat.py) is the accelerated alternative,
as the reference's branch documents.

All stages are static-shape and vmapped: detection is a dense response +
top-k, description is one vmapped kernel over all keypoints. Returns the
same Features tuple the matcher consumes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Features(NamedTuple):
    keypoints: jnp.ndarray    # (N, 2) xy
    scores: jnp.ndarray       # (N,)
    descriptors: jnp.ndarray  # (N, 128)
    mask: jnp.ndarray         # (N,) valid


def _gauss1d(sigma: float) -> jnp.ndarray:
    r = max(int(3.0 * sigma), 1)
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    k = _gauss1d(sigma)
    r = (k.shape[0] - 1) // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    img = jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"), 1, 1)(p)
    p = jnp.pad(img, ((0, 0), (r, r)), mode="edge")
    return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(p)


def _harris(img: jnp.ndarray, sigma_i: float = 2.0, k: float = 0.04) -> jnp.ndarray:
    dy, dx = jnp.gradient(img)
    sxx = _blur(dx * dx, sigma_i)
    syy = _blur(dy * dy, sigma_i)
    sxy = _blur(dx * dy, sigma_i)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _topk_nms(resp: jnp.ndarray, num: int, radius: int, threshold: float):
    H, W = resp.shape
    r = radius
    p = jnp.pad(resp, r, constant_values=-jnp.inf)
    neigh = jnp.stack(
        [
            p[r + dy : r + dy + H, r + dx : r + dx + W]
            for dy in range(-r, r + 1)
            for dx in range(-r, r + 1)
            if (dy, dx) != (0, 0)
        ]
    )
    is_max = jnp.all(resp >= neigh, axis=0) & (resp > threshold)
    flat = jnp.where(is_max, resp, -jnp.inf).ravel()
    scores, idx = jax.lax.top_k(flat, num)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    return jnp.stack([xs, ys], -1), scores


def detect_and_describe(
    img: jnp.ndarray,
    max_keypoints: int = 2048,
    contrast_threshold: float = 0.04,
    num_scales: int = 3,
    nms_radius: int = 4,
    detector: str = "dog",
) -> Features:
    """Scale-space detection + SIFT-like description. img: (H, W) uint8.

    detector='dog' (default): true DoG scale-space extrema with cv2's
    contrastThreshold semantics — an ABSOLUTE contrast test on [0, 1]
    images, tunable over the reference GUI's 0-0.1 range (gui.py:212,
    546-553; ops/sift.py). detector='harris' keeps the round-1 multi-
    scale Harris stand-in (relative response floor)."""
    if detector == "dog":
        from stereo_reconstruction_cv_tpu.ops import sift as SIFT

        # cv2 doubles the input (firstOctave -1) for extra small-scale
        # keypoints. At >= ~1 MPix the doubled base octave quadruples the
        # pyramid cost for keypoints far below the matching scale of
        # interest — detect from the native resolution there.
        H, W = img.shape
        first_octave = -1 if min(H, W) <= 800 else 0
        res = SIFT.detect_scale_space(
            img, contrast_threshold, max_keypoints, first_octave=first_octave
        )
        imgf = img.astype(jnp.float32) / 255.0
        return _describe(
            imgf, res.keypoints, res.scores, jnp.maximum(res.sigmas, 0.8),
            res.scores > 0,
        )
    return _harris_detect_and_describe(
        img, max_keypoints, contrast_threshold, num_scales, nms_radius
    )


def _harris_detect_and_describe(
    img: jnp.ndarray,
    max_keypoints: int = 2048,
    contrast_threshold: float = 0.04,
    num_scales: int = 3,
    nms_radius: int = 4,
) -> Features:
    """Round-1 multi-scale Harris detector (contrast_threshold acts as a
    relative response floor — kept for comparison/fallback)."""
    imgf = img.astype(jnp.float32) / 255.0
    per_scale = max_keypoints // num_scales

    all_pts, all_scores, all_sigmas = [], [], []
    base_sigma = 1.6
    for s in range(num_scales):
        sigma = base_sigma * (2.0 ** s)
        g = _blur(imgf, sigma)
        resp = _harris(g, sigma_i=2.0 * sigma)
        # Normalize per scale (Harris magnitudes shrink ~sigma^-4 with blur)
        # and apply a relative contrast floor so the tunable threshold acts
        # like SIFT's: the 0.04 default keeps responses above 0.004% of the
        # peak (tuned on the bundled pairs for match-count parity).
        resp = resp / (jnp.max(jnp.abs(resp)) + 1e-30)
        thr = contrast_threshold * 0.001
        pts, scores = _topk_nms(resp, per_scale, nms_radius, thr)
        all_pts.append(pts)
        all_scores.append(scores)
        all_sigmas.append(jnp.full(per_scale, sigma))
    kpts = jnp.concatenate(all_pts)
    scores = jnp.concatenate(all_scores)
    sigmas = jnp.concatenate(all_sigmas)
    valid = jnp.isfinite(scores) & (scores > 0)
    return _describe(imgf, kpts, jnp.where(valid, scores, 0.0), sigmas, valid)


def _describe(imgf, kpts, scores, sigmas, valid) -> Features:
    """Dominant-orientation + SIFT-like 128-d description of given
    keypoints; shared by the DoG and Harris detectors."""
    H, W = imgf.shape
    # Precompute gradient maps of a lightly smoothed image.
    g = _blur(imgf, 1.0)
    gy, gx = jnp.gradient(g)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]

    def sample(m, ys, xs):
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
        fx = jnp.clip(xs - x0, 0.0, 1.0)
        fy = jnp.clip(ys - y0, 0.0, 1.0)
        return (
            m[y0, x0] * (1 - fx) * (1 - fy)
            + m[y0, x0 + 1] * fx * (1 - fy)
            + m[y0 + 1, x0] * (1 - fx) * fy
            + m[y0 + 1, x0 + 1] * fx * fy
        )

    # Dominant orientation: 36-bin histogram in a circular window.
    R = 8
    oy, ox = jnp.meshgrid(
        jnp.arange(-R, R + 1, dtype=jnp.float32),
        jnp.arange(-R, R + 1, dtype=jnp.float32),
        indexing="ij",
    )
    circ = (ox**2 + oy**2) <= R * R
    gweight = jnp.exp(-(ox**2 + oy**2) / (2.0 * (R / 1.5) ** 2)) * circ

    def orientation(kp, sig):
        scale = sig / 1.6
        ys = kp[1] + oy * scale
        xs = kp[0] + ox * scale
        m = sample(mag, ys, xs) * gweight
        a = sample(ang, ys, xs)
        bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        hist = jnp.zeros(36).at[bins.ravel()].add(m.ravel())
        # smooth the histogram circularly
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        b = jnp.argmax(hist)
        return (b.astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    thetas = jax.vmap(orientation)(kpts, sigmas)

    # SIFT-like descriptor: 16x16 rotated grid -> 4x4 cells x 8 orientations.
    G = 16
    gy_off, gx_off = jnp.meshgrid(
        jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2,
        jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2,
        indexing="ij",
    )
    cell_idx = (
        jnp.clip(((gy_off + G / 2) // (G // 4)).astype(jnp.int32), 0, 3) * 4
        + jnp.clip(((gx_off + G / 2) // (G // 4)).astype(jnp.int32), 0, 3)
    ).ravel()
    dweight = jnp.exp(-(gx_off**2 + gy_off**2) / (2.0 * (G / 2) ** 2)).ravel()

    def describe(kp, theta, sig):
        c, s = jnp.cos(theta), jnp.sin(theta)
        scale = sig / 1.6
        rx = (c * gx_off - s * gy_off) * scale
        ry = (s * gx_off + c * gy_off) * scale
        ys = kp[1] + ry
        xs = kp[0] + rx
        m = (sample(mag, ys, xs) * dweight.reshape(G, G)).ravel()
        a = sample(ang, ys, xs).ravel() - theta
        ob = jnp.floor((a + 3 * jnp.pi) / (2 * jnp.pi) * 8).astype(jnp.int32) % 8
        idx = cell_idx * 8 + ob
        desc = jnp.zeros(128).at[idx].add(m)
        n = jnp.linalg.norm(desc) + 1e-8
        desc = jnp.minimum(desc / n, 0.2)
        return desc / (jnp.linalg.norm(desc) + 1e-8)

    descs = jax.vmap(describe)(kpts, thetas, sigmas)
    # Border keypoints whose window leaves the image: descriptor still
    # computed (clamped samples); mask out near-border points instead.
    margin = 8.0
    inb = (
        (kpts[:, 0] >= margin)
        & (kpts[:, 0] < W - margin)
        & (kpts[:, 1] >= margin)
        & (kpts[:, 1] < H - margin)
    )
    return Features(kpts, scores, descs, valid & inb)
