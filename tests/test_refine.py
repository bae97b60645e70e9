"""LK match refinement: synthetic subpixel-shift recovery."""

import numpy as np
import jax.numpy as jnp

from stereo_reconstruction_cv_tpu.ops.refine import refine_matches_lk


def _textured(H, W, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H // 4, W // 4))
    # Smooth upsample: differentiable texture with rich gradients.
    img = np.kron(base, np.ones((4, 4)))
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    k = k / k.sum()
    for ax in (0, 1):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax, img)
    return img.astype(np.float32)


def _shift_bilinear(img, dx, dy):
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    xs = np.clip(xs - dx, 0, W - 1.001)
    ys = np.clip(ys - dy, 0, H - 1.001)
    x0 = xs.astype(int)
    y0 = ys.astype(int)
    fx = xs - x0
    fy = ys - y0
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)


def test_recovers_subpixel_shift():
    H, W = 160, 200
    img = _textured(H, W)
    dx, dy = 0.7, -0.4
    shifted = _shift_bilinear(img, dx, dy).astype(np.float32)
    rng = np.random.default_rng(1)
    pts = rng.uniform(20, [W - 20, H - 20], size=(64, 2))
    # Coarse matcher: integer-rounded correspondence (up to 0.5+ px off,
    # plus an extra integer error on a few points).
    pr0 = np.round(pts + [dx, dy])
    pr0[:8] += 1.0
    ref, moved = refine_matches_lk(
        jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(pts), jnp.asarray(pr0)
    )
    err = np.asarray(ref) - (pts + [dx, dy])
    med = np.median(np.abs(err), axis=0)
    assert med.max() < 0.05, med
    # At least 90% of points land within 0.1 px.
    frac = np.mean(np.max(np.abs(err), axis=1) < 0.1)
    assert frac >= 0.9, frac
    assert np.any(np.asarray(moved) != 0)


def test_degenerate_and_border_points_keep_input():
    H, W = 96, 96
    img = _textured(H, W, seed=2)
    flat = np.zeros_like(img)  # gradient-degenerate TEMPLATE patch
    pts = np.array([[48.0, 48.0], [5.0, 5.0]])  # second: border reject
    pr0 = pts.copy()
    # Flat left image -> zero template Hessian -> both keep inputs.
    ref, moved = refine_matches_lk(
        jnp.asarray(flat), jnp.asarray(img), jnp.asarray(pts), jnp.asarray(pr0)
    )
    assert np.allclose(np.asarray(ref), pr0)
    assert np.allclose(np.asarray(moved), 0.0)
    # Border point rejects even with a textured template.
    ref2, moved2 = refine_matches_lk(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(pts), jnp.asarray(pr0)
    )
    assert np.allclose(np.asarray(ref2)[1], pr0[1])
    assert np.allclose(np.asarray(moved2)[1], 0.0)
