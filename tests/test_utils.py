"""Tests: profiling/metrics, model checkpointing, drawing utilities."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereo_reconstruction_cv_tpu.utils import draw as DR
from stereo_reconstruction_cv_tpu.utils.profiling import Metrics, stage_timer


class TestMetrics:
    def test_timer_and_summary(self):
        m = Metrics()
        with stage_timer("disparity", m):
            pass
        with stage_timer("disparity", m):
            pass
        m.record("matches", 123)
        s = m.summary()
        assert s["matches"] == 123
        assert s["time/disparity_calls"] == 2
        json.loads(m.dump())


@pytest.mark.slow
class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from stereo_reconstruction_cv_tpu.models import checkpoint as CK
        from stereo_reconstruction_cv_tpu.models import xfeat as XF

        model = XF.XFeatNet()
        state, _ = XF.create_train_state(jax.random.PRNGKey(0), model, (32, 32))
        path = str(tmp_path / "ckpt")
        CK.save_params(path, state.params)
        restored = CK.load_params(path, like=state.params)
        flat1 = jax.tree_util.tree_leaves(state.params)
        flat2 = jax.tree_util.tree_leaves(restored)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDraw:
    def test_epilines_renders(self, rng):
        img = rng.integers(0, 255, size=(100, 150)).astype(np.uint8)
        lines = np.array([[0.0, 1.0, -50.0], [0.1, 0.9, -40.0]])
        pts = np.array([[30.0, 50.0], [60.0, 45.0]])
        a, b = DR.draw_epilines(img, img, lines, pts, pts)
        assert a.shape == (100, 150, 3) and b.shape == (100, 150, 3)
        assert (a != np.stack([img] * 3, -1)).any()  # something was drawn

    def test_matches_canvas(self, rng):
        img = rng.integers(0, 255, size=(60, 80)).astype(np.uint8)
        k1 = rng.uniform(0, 60, size=(10, 2))
        k2 = rng.uniform(0, 60, size=(10, 2))
        canvas = DR.draw_matches(img, k1, img, k2, [(0, 1), (2, 3)])
        assert canvas.shape == (60, 160, 3)

    def test_colormap_jet(self):
        x = np.linspace(0, 1, 64).reshape(8, 8)
        c = DR.colormap_jet(x)
        assert c.shape == (8, 8, 3) and c.dtype == np.uint8
