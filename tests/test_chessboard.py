"""Chessboard detection tests: synthetic boards + one real 4K image."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from stereo_reconstruction_cv_tpu.calib import chessboard as CB


def render_board(rng, cols=9, rows=7, square=40, margin=60, warp=True):
    """Synthetic chessboard image with known inner-corner positions."""
    W = (cols + 1) * square + 2 * margin
    H = (rows + 1) * square + 2 * margin
    img = np.full((H, W), 180, np.uint8)
    for i in range(rows + 1):
        for j in range(cols + 1):
            if (i + j) % 2 == 0:
                y0 = margin + i * square
                x0 = margin + j * square
                img[y0 : y0 + square, x0 : x0 + square] = 30
    # Pixel-center convention: the edge between pixel k-1 and k is at k-0.5.
    corners = np.array(
        [
            [margin + (j + 1) * square - 0.5, margin + (i + 1) * square - 0.5]
            for i in range(rows)
            for j in range(cols)
        ],
        np.float64,
    )
    if warp:
        Hm = np.array(
            [[1.0, 0.06, 12.0], [-0.04, 0.98, 8.0], [1e-5, -2e-5, 1.0]]
        )
        img = cv2.warpPerspective(img, Hm, (W, H), borderValue=160)
        ch = np.hstack([corners, np.ones((len(corners), 1))]) @ Hm.T
        corners = ch[:, :2] / ch[:, 2:]
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    noise = rng.normal(0, 3, img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8), corners


@pytest.mark.slow
class TestSyntheticBoard:
    @pytest.mark.parametrize("warp", [False, True])
    def test_detects_full_grid(self, rng, warp):
        img, true_corners = render_board(rng, warp=warp)
        found, corners = CB.find_chessboard_corners(jnp.asarray(img), 9, 7, detect_scale=2)
        assert found
        ours = np.asarray(corners)
        d, idx = cKDTree(true_corners).query(ours)
        assert sorted(idx.tolist()) == list(range(63))  # bijection
        assert d.mean() < 0.5, d.mean()

    def test_ordering_matches_object_grid(self, rng):
        """Row-major (x fastest) ordering so corners pair with
        build_object_points — homography from obj grid must be consistent."""
        img, true_corners = render_board(rng, warp=False)
        found, corners = CB.find_chessboard_corners(jnp.asarray(img), 9, 7, detect_scale=2)
        assert found
        ours = np.asarray(corners)
        # first 9 corners = top row left->right
        assert (np.diff(ours[:9, 0]) > 0).all()
        assert ours[:9, 1].std() < 2.0
        # rows increase in y
        assert ours[9, 1] > ours[0, 1]


@pytest.mark.slow
class TestRealImage:
    def test_matches_cv2_corners(self):
        gray = cv2.imread(
            "/root/reference/calibration_data_logitech_3840x2160/WIN_20250221_10_41_29_Pro.jpg",
            cv2.IMREAD_GRAYSCALE,
        )
        assert gray is not None
        found, corners = CB.find_chessboard_corners(jnp.asarray(gray), 9, 7)
        assert found
        ok, ccv = cv2.findChessboardCorners(
            gray, (9, 7),
            cv2.CALIB_CB_ADAPTIVE_THRESH + cv2.CALIB_CB_FAST_CHECK + cv2.CALIB_CB_NORMALIZE_IMAGE,
        )
        ccv = cv2.cornerSubPix(
            gray, ccv, (11, 11), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001),
        ).reshape(-1, 2)
        d, idx = cKDTree(ccv).query(np.asarray(corners))
        assert sorted(idx.tolist()) == list(range(63))
        assert d.mean() < 0.1, d.mean()


class TestSubpix:
    def test_refines_toward_true_saddle(self, rng):
        img, true_corners = render_board(rng, warp=False)
        # perturb the true corners by up to 1.5 px, refine, expect recovery
        noisy = true_corners + rng.uniform(-1.5, 1.5, true_corners.shape)
        refined = np.asarray(
            CB.corner_subpix(jnp.asarray(img), jnp.asarray(noisy, dtype=jnp.float32))
        )
        err_before = np.linalg.norm(noisy - true_corners, axis=1).mean()
        err_after = np.linalg.norm(refined - true_corners, axis=1).mean()
        assert err_after < err_before * 0.5
        assert err_after < 0.3


class TestCornerSubpixPatch:
    def test_matches_full_image_refiner(self, rng):
        """corner_subpix_patch must reproduce corner_subpix wherever the
        refinement stays inside the patch (models/xfeat detect path)."""
        import cv2
        import jax.numpy as jnp

        from stereo_reconstruction_cv_tpu.calib.chessboard import (
            corner_subpix,
            corner_subpix_patch,
        )

        img = cv2.resize(
            cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (320, 184)
        )
        pts = np.stack(
            [
                rng.uniform(12, 308, size=64),
                rng.uniform(12, 172, size=64),
            ],
            axis=-1,
        ).astype(np.float32)
        ref = np.asarray(corner_subpix(jnp.asarray(img), jnp.asarray(pts),
                                       win=3, max_iter=5))
        got = np.asarray(corner_subpix_patch(jnp.asarray(img), jnp.asarray(pts),
                                             win=3, max_iter=5, max_drift=5.0))
        # What detect consumes: the <=1.5 px acceptance gate must make the
        # same decisions, and accepted points must coincide.
        dr = np.max(np.abs(ref - pts), axis=-1)
        dg = np.max(np.abs(got - pts), axis=-1)
        assert ((dr <= 1.5) == (dg <= 1.5)).all()
        kept = (dr <= 1.5) & (dg <= 1.5)
        assert kept.sum() >= 8
        np.testing.assert_allclose(got[kept], ref[kept], atol=5e-3)

    def test_border_keypoints_centered(self, rng):
        """Border keypoints refine around their TRUE location (the patch is
        taken from an edge-padded image, not recentred by clipping — r4
        review finding: a clipped patch could pass the gate at a shifted
        position)."""
        import cv2
        import jax.numpy as jnp

        from stereo_reconstruction_cv_tpu.calib.chessboard import (
            corner_subpix_patch,
        )

        img = cv2.resize(
            cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (320, 184)
        )
        pts = np.array(
            [[2.0, 50.0], [317.0, 90.0], [100.0, 2.0], [200.0, 181.0],
             [0.0, 0.0], [319.0, 183.0]], dtype=np.float32
        )
        got = np.asarray(corner_subpix_patch(jnp.asarray(img), jnp.asarray(pts),
                                             win=3, max_iter=5, max_drift=5.0))
        assert np.isfinite(got).all()
        # The refinement stays anchored near its start (clip is +-2/iter
        # but convergence keeps accepted points local); no wild jumps from
        # a recentred patch.
        assert (np.abs(got - pts) <= 10.0).all()

