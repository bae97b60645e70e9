"""Calibration tests: synthetic ground truth + parity with cv2.calibrateCamera."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.calib import zhang as Z


def synth_views(rng, V=12, noise=0.0, cols=9, rows=7):
    K = np.array([[2250.0, 0, 1920.0], [0, 2240.0, 1080.0], [0, 0, 1.0]])
    dist = np.array([0.2, -0.55, -1e-5, 5e-4, 0.38])
    obj = np.asarray(Z.build_object_points(cols, rows))
    imgs, rvecs, tvecs = [], [], []
    for _ in range(V):
        rvec = rng.normal(size=3) * np.array([0.3, 0.3, 0.5])
        tvec = np.array([
            rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(12, 25)
        ])
        # center the board-ish
        tvec[:2] -= np.array([cols, rows]) / 2
        proj, _ = cv2.projectPoints(obj, rvec, tvec, K, dist)
        proj = proj.reshape(-1, 2)
        proj += rng.normal(size=proj.shape) * noise
        imgs.append(proj)
        rvecs.append(rvec)
        tvecs.append(tvec)
    return K, dist, obj, np.stack(imgs), np.stack(rvecs), np.stack(tvecs)


class TestHomography:
    def test_dlt_exact(self, rng):
        H_true = np.array([[1.2, 0.1, 5.0], [-0.05, 0.9, -3.0], [1e-4, -2e-4, 1.0]])
        src = rng.uniform(-10, 10, size=(40, 2))
        hom = np.hstack([src, np.ones((40, 1))]) @ H_true.T
        dst = hom[:, :2] / hom[:, 2:]
        H = np.asarray(Z.homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(H, H_true, atol=1e-8)


@pytest.mark.slow
class TestZhangInit:
    def test_intrinsics_close_to_truth(self, rng):
        K, dist, obj, imgs, _, _ = synth_views(rng, V=15, noise=0.0)
        # Zhang init assumes no distortion; use undistorted projections.
        imgs_ud = []
        for i in range(imgs.shape[0]):
            und = cv2.undistortPoints(
                imgs[i].reshape(-1, 1, 2), K, dist, P=K
            ).reshape(-1, 2)
            imgs_ud.append(und)
        imgs_ud = np.stack(imgs_ud)
        Hs = jax.vmap(lambda ip: Z.homography_dlt(jnp.asarray(obj[:, :2]), ip))(
            jnp.asarray(imgs_ud)
        )
        K0 = np.asarray(Z.zhang_intrinsics(Hs, (3840, 2160)))
        assert abs(K0[0, 0] - K[0, 0]) / K[0, 0] < 0.05
        assert abs(K0[1, 1] - K[1, 1]) / K[1, 1] < 0.05
        assert abs(K0[0, 2] - K[0, 2]) < 100
        assert abs(K0[1, 2] - K[1, 2]) < 100


@pytest.mark.slow
class TestCalibrate:
    def test_recovers_truth_noiseless(self, rng):
        K, dist, obj, imgs, _, _ = synth_views(rng, V=12, noise=0.0)
        res = Z.calibrate_camera(jnp.asarray(obj), jnp.asarray(imgs), (3840, 2160))
        assert float(res.mean_error) < 0.02, float(res.mean_error)
        np.testing.assert_allclose(np.asarray(res.K)[0, 0], K[0, 0], rtol=5e-3)
        np.testing.assert_allclose(np.asarray(res.K)[1, 1], K[1, 1], rtol=5e-3)
        np.testing.assert_allclose(np.asarray(res.dist)[:2], dist[:2], atol=0.02)

    def test_parity_with_cv2_noisy(self, rng):
        K, dist, obj, imgs, _, _ = synth_views(rng, V=12, noise=0.3)
        res = Z.calibrate_camera(jnp.asarray(obj), jnp.asarray(imgs), (3840, 2160))
        rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
            [obj.astype(np.float32)] * imgs.shape[0] if False else [obj.astype(np.float32) for _ in range(imgs.shape[0])],
            [imgs[i].astype(np.float32).reshape(-1, 1, 2) for i in range(imgs.shape[0])],
            (3840, 2160), None, None,
        )
        # Same optimum within tolerance; RMS no worse than 5% over cv2's.
        assert float(res.rms) <= rms_cv * 1.05, (float(res.rms), rms_cv)
        np.testing.assert_allclose(np.asarray(res.K)[0, 0], K_cv[0, 0], rtol=5e-3)
        np.testing.assert_allclose(np.asarray(res.K)[0, 2], K_cv[0, 2], rtol=5e-3)

    @pytest.mark.filterwarnings("ignore")
    def test_real_dataset_parity(self):
        """Corners from 8 of the bundled 4K chessboard images (detected with
        cv2 as the test oracle), calibrated by us vs cv2.calibrateCamera."""
        import glob

        files = sorted(
            glob.glob("/root/reference/calibration_data_logitech_3840x2160/*.jpg")
        )[:8]
        assert files
        obj = np.asarray(Z.build_object_points(9, 7)).astype(np.float32)
        pts = []
        for f in files:
            gray = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
            ok, corners = cv2.findChessboardCorners(
                gray, (9, 7),
                cv2.CALIB_CB_ADAPTIVE_THRESH + cv2.CALIB_CB_FAST_CHECK + cv2.CALIB_CB_NORMALIZE_IMAGE,
            )
            if not ok:
                continue
            corners = cv2.cornerSubPix(
                gray, corners, (11, 11), (-1, -1),
                (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001),
            )
            pts.append(corners.reshape(-1, 2))
        assert len(pts) >= 5
        imgs = np.stack(pts)
        res = Z.calibrate_camera(
            jnp.asarray(obj, dtype=jnp.float64), jnp.asarray(imgs, dtype=jnp.float64), (3840, 2160)
        )
        rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
            [obj] * len(pts), [p.reshape(-1, 1, 2) for p in pts], (3840, 2160), None, None
        )
        assert float(res.rms) <= rms_cv * 1.10, (float(res.rms), rms_cv)
        np.testing.assert_allclose(np.asarray(res.K)[0, 0], K_cv[0, 0], rtol=0.02)
        np.testing.assert_allclose(np.asarray(res.K)[1, 2], K_cv[1, 2], rtol=0.02)
        # Reference anchor: mean reprojection error comparable to 0.149 px.
        assert float(res.mean_error) < 0.5
