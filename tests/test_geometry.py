"""Golden tests: core geometry vs OpenCV (the reference's compute layer)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.ops import geometry as G


def random_pose(rng, scale=1.0):
    rvec = rng.normal(size=3) * scale
    tvec = rng.normal(size=3)
    return rvec, tvec


def random_K(rng):
    return np.array(
        [[2250.0 + rng.normal(), 0.0, 1920.0], [0.0, 2245.0, 1080.0], [0.0, 0.0, 1.0]]
    )


class TestRodrigues:
    @pytest.mark.parametrize("scale", [1.0, 0.1, 1e-9, 3.0])
    def test_to_matrix_matches_cv2(self, rng, scale):
        for _ in range(5):
            rvec = rng.normal(size=3) * scale
            R_cv, _ = cv2.Rodrigues(rvec)
            R = np.asarray(G.rodrigues_to_matrix(jnp.asarray(rvec)))
            np.testing.assert_allclose(R, R_cv, atol=1e-10)

    def test_roundtrip(self, rng):
        for scale in [1.0, 0.01, 2.9]:
            rvec = rng.normal(size=3)
            rvec = rvec / np.linalg.norm(rvec) * scale
            R = G.rodrigues_to_matrix(jnp.asarray(rvec))
            back = np.asarray(G.matrix_to_rodrigues(R))
            np.testing.assert_allclose(back, rvec, atol=1e-7)

    def test_near_pi(self, rng):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        rvec = axis * (np.pi - 1e-5)
        R = G.rodrigues_to_matrix(jnp.asarray(rvec))
        back = np.asarray(G.matrix_to_rodrigues(R))
        R2 = np.asarray(G.rodrigues_to_matrix(jnp.asarray(back)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-6)

    def test_identity(self):
        np.testing.assert_allclose(
            np.asarray(G.rodrigues_to_matrix(jnp.zeros(3))), np.eye(3), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(G.matrix_to_rodrigues(jnp.eye(3))), np.zeros(3), atol=1e-12
        )


class TestProjectPoints:
    def test_matches_cv2_with_distortion(self, rng):
        K = random_K(rng)
        dist = np.array([0.209, -0.5576, -7.2e-6, 5.2e-4, 0.3812])
        obj = rng.uniform(-1, 1, size=(50, 3)) + np.array([0, 0, 5.0])
        rvec, tvec = random_pose(rng, 0.2)
        proj_cv, _ = cv2.projectPoints(obj, rvec, tvec, K, dist)
        proj = np.asarray(
            G.project_points(jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K), jnp.asarray(dist))
        )
        np.testing.assert_allclose(proj, proj_cv.reshape(-1, 2), atol=1e-8)

    def test_no_distortion(self, rng):
        K = random_K(rng)
        obj = rng.uniform(-1, 1, size=(20, 3)) + np.array([0, 0, 4.0])
        rvec, tvec = random_pose(rng, 0.1)
        proj_cv, _ = cv2.projectPoints(obj, rvec, tvec, K, None)
        proj = np.asarray(
            G.project_points(jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K))
        )
        np.testing.assert_allclose(proj, proj_cv.reshape(-1, 2), atol=1e-8)


class TestUndistort:
    def test_undistort_inverts_distort(self, rng):
        dist = jnp.asarray([0.2, -0.5, 1e-4, -2e-4, 0.3])
        xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(100, 2)))
        xyd = G.distort_normalized(xy, dist)
        back = G.undistort_normalized(xyd, dist, num_iters=20)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-8)


class TestEpilines:
    def test_matches_cv2(self, rng):
        F = rng.normal(size=(3, 3))
        F[2, 2] = 1.0
        pts = rng.uniform(0, 1000, size=(30, 2))
        for which in (1, 2):
            lines_cv = cv2.computeCorrespondEpilines(
                pts.reshape(-1, 1, 2), which, F
            ).reshape(-1, 3)
            lines = np.asarray(G.compute_epilines(jnp.asarray(pts), jnp.asarray(F), which))
            # cv2 normalizes with sign convention a^2+b^2=1; signs may differ.
            ratio = lines / lines_cv
            np.testing.assert_allclose(np.abs(ratio), np.ones_like(ratio), atol=1e-8)


class TestTriangulate:
    def test_matches_cv2(self, rng):
        K = random_K(rng)
        R = cv2.Rodrigues(np.array([0.02, 0.3, -0.01]))[0]
        t = np.array([[-1.0], [0.05], [0.02]])
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t])
        X = rng.uniform(-2, 2, size=(40, 3)) + np.array([0, 0, 8.0])
        x1 = cv2.projectPoints(X, np.zeros(3), np.zeros(3), K, None)[0].reshape(-1, 2)
        x2 = cv2.projectPoints(X, cv2.Rodrigues(R)[0], t, K, None)[0].reshape(-1, 2)
        Xh = np.asarray(G.triangulate_to_3d(jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(x1), jnp.asarray(x2)))
        np.testing.assert_allclose(Xh, X, atol=1e-5)
        # cross-check vs cv2.triangulatePoints
        Xcv = cv2.triangulatePoints(P1, P2, x1.T, x2.T)
        Xcv = (Xcv[:3] / Xcv[3:]).T
        np.testing.assert_allclose(Xh, Xcv, atol=1e-5)


class TestReproject3D:
    def test_matches_cv2(self, rng):
        Q = np.array(
            [
                [1.0, 0, 0, -1910.0],
                [0, 1.0, 0, -1057.7],
                [0, 0, 0, 2045.48],
                [0, 0, 1.0 / 0.14, 0],
            ]
        )
        disp = rng.uniform(0.5, 64, size=(24, 32)).astype(np.float32)
        pts_cv = cv2.reprojectImageTo3D(disp, Q)
        pts = np.asarray(G.reproject_image_to_3d(jnp.asarray(disp), jnp.asarray(Q, dtype=jnp.float32)))
        np.testing.assert_allclose(pts, pts_cv, rtol=1e-4, atol=1e-3)

    def test_zero_disparity_goes_inf(self):
        Q = np.eye(4)
        Q[3] = [0, 0, 1.0, 0]
        disp = np.zeros((4, 4), np.float32)
        pts = np.asarray(G.reproject_image_to_3d(jnp.asarray(disp), jnp.asarray(Q, dtype=jnp.float32)))
        mask = np.asarray(
            __import__("stereo_reconstruction_cv_tpu.ops.geometry", fromlist=["g"]).valid_point_mask(
                jnp.asarray(pts), jnp.asarray(disp)
            )
        )
        assert not mask.any()
