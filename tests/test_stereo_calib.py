"""Stereo calibration vs cv2.stereoCalibrate on synthetic rigs."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from stereo_reconstruction_cv_tpu.calib import stereo as SC
from stereo_reconstruction_cv_tpu.calib import zhang as Z


def synth_stereo_views(rng, V=10, noise=0.1):
    K1 = np.array([[1200.0, 0, 960.0], [0, 1190.0, 540.0], [0, 0, 1.0]])
    K2 = np.array([[1210.0, 0, 955.0], [0, 1205.0, 545.0], [0, 0, 1.0]])
    d1 = np.array([0.1, -0.2, 1e-4, -1e-4, 0.05])
    d2 = np.array([0.08, -0.15, -1e-4, 2e-4, 0.03])
    R = cv2.Rodrigues(np.array([0.01, 0.05, -0.008]))[0]
    T = np.array([-0.5, 0.01, 0.02])
    obj = np.asarray(Z.build_object_points(9, 7, square=0.03))
    i1, i2 = [], []
    for _ in range(V):
        rvec = rng.normal(size=3) * np.array([0.3, 0.3, 0.4])
        tvec = np.array([rng.uniform(-0.2, 0.2) - 0.12, rng.uniform(-0.15, 0.15) - 0.1, rng.uniform(0.8, 1.6)])
        p1 = cv2.projectPoints(obj, rvec, tvec, K1, d1)[0].reshape(-1, 2)
        R1 = cv2.Rodrigues(rvec)[0]
        rv2 = cv2.Rodrigues(R @ R1)[0]
        t2 = R @ tvec + T
        p2 = cv2.projectPoints(obj, rv2, t2, K2, d2)[0].reshape(-1, 2)
        i1.append(p1 + rng.normal(size=p1.shape) * noise)
        i2.append(p2 + rng.normal(size=p2.shape) * noise)
    return dict(K1=K1, K2=K2, d1=d1, d2=d2, R=R, T=T, obj=obj,
                img1=np.stack(i1), img2=np.stack(i2))


@pytest.mark.slow
def test_recovers_rig_geometry(rng):
    sc = synth_stereo_views(rng, V=10, noise=0.05)
    res = SC.calibrate_stereo(
        jnp.asarray(sc["obj"]), jnp.asarray(sc["img1"]), jnp.asarray(sc["img2"]), (1920, 1080)
    )
    np.testing.assert_allclose(np.asarray(res.R), sc["R"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.T), sc["T"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.K1)[0, 0], sc["K1"][0, 0], rtol=0.01)
    np.testing.assert_allclose(np.asarray(res.K2)[1, 1], sc["K2"][1, 1], rtol=0.01)
    assert float(res.rms) < 0.2


@pytest.mark.slow
def test_parity_with_cv2_stereo_calibrate(rng):
    """cv2 needs per-camera pre-calibration (its standard workflow — with
    None initials this cv2 build degenerates to fx=1); we compare both
    pipelines against the synthetic ground truth."""
    sc = synth_stereo_views(rng, V=10, noise=0.15)
    res = SC.calibrate_stereo(
        jnp.asarray(sc["obj"]), jnp.asarray(sc["img1"]), jnp.asarray(sc["img2"]), (1920, 1080)
    )
    obj32 = sc["obj"].astype(np.float32)
    i1 = [sc["img1"][i].astype(np.float32).reshape(-1, 1, 2) for i in range(10)]
    i2 = [sc["img2"][i].astype(np.float32).reshape(-1, 1, 2) for i in range(10)]
    _, K1c, d1c, _, _ = cv2.calibrateCamera([obj32] * 10, i1, (1920, 1080), None, None)
    _, K2c, d2c, _, _ = cv2.calibrateCamera([obj32] * 10, i2, (1920, 1080), None, None)
    rms_cv, _, _, _, _, Rc, Tc, _, _ = cv2.stereoCalibrate(
        [obj32] * 10, i1, i2, K1c, d1c, K2c, d2c, (1920, 1080),
        flags=cv2.CALIB_USE_INTRINSIC_GUESS,
    )
    err_R_ours = np.abs(np.asarray(res.R) - sc["R"]).max()
    err_R_cv = np.abs(Rc - sc["R"]).max()
    err_T_ours = np.abs(np.asarray(res.T) - sc["T"]).max()
    err_T_cv = np.abs(Tc.ravel() - sc["T"]).max()
    assert err_R_ours <= max(err_R_cv * 1.5, 5e-3), (err_R_ours, err_R_cv)
    assert err_T_ours <= max(err_T_cv * 1.5, 2e-3), (err_T_ours, err_T_cv)
    assert float(res.rms) <= max(rms_cv * 1.05, 0.25)


@pytest.mark.slow
def test_calibrate_stereo_rig_folder_workflow(tmp_path, rng):
    """Folder-level two-camera workflow: render synthetic board pairs to
    disk, run the stage end-to-end through detection + joint calibration."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_chessboard import render_board

    from stereo_reconstruction_cv_tpu.pipeline import stages

    d1 = tmp_path / "cam1"
    d2 = tmp_path / "cam2"
    d1.mkdir(); d2.mkdir()
    # Simple rig: camera 2 sees the same board shifted (pure translation in
    # image space approximates a small-baseline rig for the detection path).
    for i in range(4):
        img, _ = render_board(rng, warp=True)
        cv2.imwrite(str(d1 / f"v{i}.jpg"), img)
        M = np.float32([[1, 0, -12], [0, 1, 3]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]), borderValue=160)
        cv2.imwrite(str(d2 / f"v{i}.jpg"), img2)
    out = stages.calibrate_stereo_rig(str(d1), str(d2))
    assert "error" not in out, out.get("error")
    assert out["num_pairs"] >= 3
    assert np.isfinite(out["R"]).all() and np.isfinite(out["T"]).all()
