"""Zhang-style camera calibration with Levenberg-Marquardt refinement.

Replaces cv2.calibrateCamera (reference gui.py:64-66, main.ipynb cell 1) —
the Zhang homography initialization runs as batched solves over all views,
and the LM bundle refinement is a fixed-iteration jit loop with a
forward-mode Jacobian, so the whole calibration is one compiled program.

Model: pinhole K = [[fx, 0, cx], [0, fy, cy], [0, 0, 1]] with 5-coefficient
distortion (k1, k2, p1, p2, k3), zero skew — OpenCV's default configuration.

Reference accuracy anchor to match: mean reprojection error 0.14876 px on
the bundled 44-view 4K dataset (BASELINE.md).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stereo_reconstruction_cv_tpu.ops import epipolar as EP
from stereo_reconstruction_cv_tpu.ops import geometry as G


def build_object_points(cols: int = 9, rows: int = 7, square: float = 1.0) -> jnp.ndarray:
    """(cols*rows, 3) planar grid, matching the reference's np.mgrid layout
    (gui.py:31-32): x varies fastest."""
    xs = jnp.arange(cols, dtype=jnp.float64) * square
    ys = jnp.arange(rows, dtype=jnp.float64) * square
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx.ravel(), gy.ravel(), jnp.zeros(cols * rows, jnp.float64)], axis=-1)


def homography_dlt(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Normalized DLT homography: dst ~ H @ src. src/dst (N, 2)."""
    s, Ts = EP.normalize_points(src)
    d, Td = EP.normalize_points(dst)
    x, y = s[:, 0], s[:, 1]
    u, v = d[:, 0], d[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, vec = jnp.linalg.eigh(A.T @ A)
    H = vec[:, 0].reshape(3, 3)
    H = jnp.linalg.inv(Td) @ H @ Ts
    return H / H[2, 2]


def zhang_intrinsics(Hs: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Closed-form K from view homographies (Zhang's B-matrix method).

    Hs: (V, 3, 3). Falls back to a principal-point-centered solution if the
    conic is indefinite (degenerate motion)."""
    W, H_img = image_size

    def v_ij(H, i, j):
        return jnp.array(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    def rows(H):
        return jnp.stack([v_ij(H, 0, 1), v_ij(H, 0, 0) - v_ij(H, 1, 1)])

    Vm = jax.vmap(rows)(Hs).reshape(-1, 6)
    _, vec = jnp.linalg.eigh(Vm.T @ Vm)
    b = vec[:, 0]
    B11, B12, B22, B13, B23, B33 = b
    den = B11 * B22 - B12 * B12
    cy = (B12 * B13 - B11 * B23) / den
    lam = B33 - (B13 * B13 + cy * (B12 * B13 - B11 * B23)) / B11
    fx2 = lam / B11
    fy2 = lam * B11 / den
    fx = jnp.sqrt(jnp.abs(fx2))
    fy = jnp.sqrt(jnp.abs(fy2))
    cx = -B13 * fx * fx / lam
    skew_ok = (fx2 > 0) & (fy2 > 0)
    # Degenerate fallback: principal point at image center, shared focal
    # estimated from the homographies under that assumption.
    fx_fb = jnp.sqrt(jnp.abs(lam / jnp.where(B11 == 0, 1e-12, B11)))
    K = jnp.where(
        skew_ok,
        jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]]),
        jnp.array(
            [[fx_fb, 0.0, (W - 1) / 2.0], [0.0, fx_fb, (H_img - 1) / 2.0], [0.0, 0.0, 1.0]]
        ),
    )
    return K


def extrinsics_from_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Per-view (rvec, tvec) from H = K [r1 r2 t] (planar target)."""
    Kinv = jnp.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.linalg.norm(Kinv @ h1)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = jnp.cross(r1, r2)
    t = lam * (Kinv @ h3)
    R = jnp.stack([r1, r2, r3], axis=1)
    # Project onto SO(3).
    u, _, vt = jnp.linalg.svd(R)
    R = u @ vt
    R = R * jnp.sign(jnp.linalg.det(R))
    # Cheirality: the target must be in front of the camera.
    flip = t[2] < 0
    R = jnp.where(flip, -R.at[:, 2].multiply(-1.0), R)
    t = jnp.where(flip, -t, t)
    return G.matrix_to_rodrigues(R), t


class CalibrationResult(NamedTuple):
    K: jnp.ndarray            # (3, 3)
    dist: jnp.ndarray         # (5,) k1 k2 p1 p2 k3
    rvecs: jnp.ndarray        # (V, 3)
    tvecs: jnp.ndarray        # (V, 3)
    rms: jnp.ndarray          # scalar: sqrt(mean squared residual), cv2's return
    per_view_error: jnp.ndarray  # (V,) mean L2 reprojection error per view
    mean_error: jnp.ndarray   # scalar: the reference's metric (gui.py:68-73)


def _pack(K, dist, rvecs, tvecs):
    return jnp.concatenate(
        [jnp.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]), dist, rvecs.ravel(), tvecs.ravel()]
    )


def _unpack(theta, V):
    fx, fy, cx, cy = theta[0], theta[1], theta[2], theta[3]
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    dist = theta[4:9]
    rvecs = theta[9 : 9 + 3 * V].reshape(V, 3)
    tvecs = theta[9 + 3 * V :].reshape(V, 3)
    return K, dist, rvecs, tvecs


def _residuals(theta, obj_pts, img_pts):
    """(V*N*2,) reprojection residuals."""
    V = img_pts.shape[0]
    K, dist, rvecs, tvecs = _unpack(theta, V)
    proj = jax.vmap(lambda rv, tv: G.project_points(obj_pts, rv, tv, K, dist))(
        rvecs, tvecs
    )
    return (proj - img_pts).ravel()


def calibrate_camera(
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    image_size: Tuple[int, int],
    max_iters: int = 30,
) -> CalibrationResult:
    """Full calibration: Zhang init + LM bundle refinement.

    obj_pts: (N, 3) planar target points (z = 0), shared by all views.
    img_pts: (V, N, 2) detected corners per view.
    """
    obj_pts = jnp.asarray(obj_pts)
    img_pts = jnp.asarray(img_pts)
    V = img_pts.shape[0]
    obj_xy = obj_pts[:, :2]

    Hs = jax.vmap(lambda ip: homography_dlt(obj_xy, ip))(img_pts)
    K0 = zhang_intrinsics(Hs, image_size)
    rt = jax.vmap(lambda H: extrinsics_from_homography(H, K0))(Hs)
    rvecs0, tvecs0 = rt
    theta0 = _pack(K0, jnp.zeros(5, obj_pts.dtype), rvecs0, tvecs0)

    res_fn = lambda th: _residuals(th, obj_pts, img_pts)

    def lm_step(state, _):
        theta, lam, prev_cost = state
        r = res_fn(theta)
        J = jax.jacfwd(res_fn)(theta)
        JtJ = J.T @ J
        g = J.T @ r
        n = theta.shape[0]
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-12)
        delta = jnp.linalg.solve(A, -g)
        theta_new = theta + delta
        new_cost = jnp.sum(res_fn(theta_new) ** 2)
        accept = new_cost < prev_cost
        theta = jnp.where(accept, theta_new, theta)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, prev_cost)
        return (theta, lam, cost), cost

    cost0 = jnp.sum(res_fn(theta0) ** 2)
    (theta, _, _), _ = jax.lax.scan(
        lm_step, (theta0, jnp.asarray(1e-3, obj_pts.dtype), cost0), None, length=max_iters
    )

    K, dist, rvecs, tvecs = _unpack(theta, V)
    r = res_fn(theta).reshape(V, -1, 2)
    rms = jnp.sqrt(jnp.mean(jnp.sum(r**2, axis=-1)))
    # The reference's error metric (gui.py:68-73): per view,
    # norm(imgpoints - projected, L2) / len(points), then mean over views.
    per_view = jnp.linalg.norm(r.reshape(V, -1), axis=-1) / r.shape[1]
    return CalibrationResult(K, dist, rvecs, tvecs, rms, per_view, jnp.mean(per_view))
