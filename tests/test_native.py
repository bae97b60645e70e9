"""Native runtime tests: speckle CC parity with cv2, JPEG decode, prefetch."""

import cv2
import numpy as np
import pytest

from stereo_reconstruction_cv_tpu import native
from stereo_reconstruction_cv_tpu.parallel.prefetch import PrefetchLoader


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestSpeckle:
    def test_exact_cv2_parity(self, rng):
        disp16 = (rng.integers(0, 4, size=(80, 100)) * 80).astype(np.int16)
        disp16[30:33, 40:44] = 77 * 16
        d = disp16.astype(np.float32) / 16
        keep = native.filter_speckles(d, np.ones_like(d, bool), 25, 2.0)
        dcv = disp16.copy()
        cv2.filterSpeckles(dcv, -16, 25, 2 * 16)
        np.testing.assert_array_equal(keep, dcv != -16)

    def test_respects_input_validity(self, rng):
        d = np.zeros((20, 20), np.float32)
        v = np.ones((20, 20), bool)
        v[:, 10:] = False  # invalid half must stay invalid
        keep = native.filter_speckles(d, v, 5, 1.0)
        assert not keep[:, 10:].any()
        assert keep[:, :10].all()  # 200-px region > 5


class TestJpeg:
    def test_bitexact_vs_cv2(self):
        p = "/root/reference/dataset/d2/img1.jpg"
        ours = native.load_image(p, gray=True)
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(ours, ref)

    def test_rgb(self):
        p = "/root/reference/dataset/d2/img2.jpg"
        ours = native.load_image(p, gray=False)
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(ours, ref)

    def test_bad_data_returns_none(self):
        assert native.decode_jpeg(b"not a jpeg") is None


class TestPrefetch:
    def test_yields_all_batches_in_order(self):
        pairs = [("/root/reference/dataset/d2/img1.jpg", "/root/reference/dataset/d2/img2.jpg")] * 5
        loader = PrefetchLoader(pairs, batch_size=2, prefetch=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0][0].shape == (2, 1080, 1920)
        assert batches[-1][0].shape == (1, 1080, 1920)
        ref = cv2.imread(pairs[0][0], 0)
        np.testing.assert_array_equal(np.asarray(batches[0][0][0]), ref)
