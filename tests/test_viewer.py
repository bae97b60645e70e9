"""HTML point-cloud viewer export (the headless Open3D-window stand-in)."""

import numpy as np

from stereo_reconstruction_cv_tpu.io import ply as PLY
from stereo_reconstruction_cv_tpu.io import viewer as VW


class TestHtmlViewer:
    def test_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        colors = rng.integers(0, 256, size=(500, 3)).astype(np.uint8)
        p = str(tmp_path / "cloud.html")
        n = VW.write_html_viewer(p, pts, colors)
        assert n == 500
        pts2, col2 = VW.read_html_viewer(p)
        np.testing.assert_array_equal(pts2, pts)
        np.testing.assert_array_equal(col2, colors)
        html = open(p).read()
        assert "<html>" in html and "webgl" in html

    def test_no_colors_and_subsample(self, tmp_path, rng):
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        p = str(tmp_path / "cloud.html")
        n = VW.write_html_viewer(p, pts, max_points=100)
        assert n == 100
        pts2, col2 = VW.read_html_viewer(p)
        assert pts2.shape == (100, 3) and col2 is None
        # Deterministic subsample preserves point membership.
        asset = {tuple(q) for q in np.round(pts, 4)}
        assert all(tuple(q) in asset for q in np.round(pts2, 4))

    def test_export_stage_dispatches_on_extension(self, tmp_path, rng):
        from stereo_reconstruction_cv_tpu.pipeline import stages

        pts = rng.normal(size=(8, 6, 3)).astype(np.float32)
        disp = np.abs(rng.normal(size=(8, 6))).astype(np.float32) + 0.1
        html = str(tmp_path / "c.html")
        plyp = str(tmp_path / "c.ply")
        n1 = stages.export_point_cloud(html, pts, disp)
        n2 = stages.export_point_cloud(plyp, pts, disp)
        assert n1 == n2 == 48
        assert open(html).read().startswith("<!DOCTYPE html>")
        p, _ = PLY.read_ply(plyp)
        assert p.shape == (48, 3)
