"""CLI smoke tests on downscaled bundled data (headless tab equivalents)."""

import os

import cv2
import numpy as np
import pytest

from stereo_reconstruction_cv_tpu import cli


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("pair")
    imL = cv2.resize(cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (320, 184))
    imR = cv2.resize(cv2.imread("/root/reference/dataset/d2/img2.jpg", 0), (320, 184))
    cv2.imwrite(str(d / "img1.jpg"), imL)
    cv2.imwrite(str(d / "img2.jpg"), imR)
    return str(d)


@pytest.mark.slow
def test_match_verb(tiny_pair, capsys):
    rc = cli.main(["match", tiny_pair])
    assert rc == 0
    out = capsys.readouterr().out
    assert "good matches" in out


@pytest.mark.slow
def test_match_learned_verb(tiny_pair, capsys):
    rc = cli.main(["match", tiny_pair, "--learned"])
    assert rc == 0
    assert "keypoints" in capsys.readouterr().out


@pytest.mark.slow
def test_disparity_verb(tiny_pair, tmp_path, capsys):
    outdir = str(tmp_path / "disp")
    rc = cli.main(["disparity", tiny_pair, "--ndisp", "32", "--outdir", outdir])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "disparity.npy"))
    assert os.path.exists(os.path.join(outdir, "disparity_jet.png"))
    disp = np.load(os.path.join(outdir, "disparity.npy"))
    assert disp.shape == (184, 320)


@pytest.mark.slow
def test_geometry_verb(tiny_pair, capsys):
    rc = cli.main(["geometry", tiny_pair, "--baseline", "0.14"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Essential Matrix" in out and "Translation Vector" in out


@pytest.mark.slow
def test_report_verb(tiny_pair, tmp_path, capsys):
    out = str(tmp_path / "report.html")
    rc = cli.main(["report", tiny_pair, "--ndisp", "16", "--output", out])
    assert rc == 0
    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    # every stage section present, imagery embedded, viewer inlined
    for sec in ("Feature detection", "Rectification + geometry",
                "Dense disparity", "3D reconstruction"):
        assert sec in html
    assert "data:image/png;base64," in html
    assert "srcdoc=" in html
