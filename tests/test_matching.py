"""Tests: exact top-2 matcher vs cv2 BFMatcher (exact reference for FLANN)."""

import cv2
import numpy as np
import jax.numpy as jnp

from stereo_reconstruction_cv_tpu.ops import matching as M


def test_knn2_matches_bfmatcher(rng):
    d1 = rng.normal(size=(100, 128)).astype(np.float32)
    d2 = rng.normal(size=(120, 128)).astype(np.float32)
    # make 60 strong true matches
    d2[:60] = d1[:60] + rng.normal(size=(60, 128)).astype(np.float32) * 0.05
    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(d1, d2, k=2)
    res = M.knn2_match(jnp.asarray(d1), jnp.asarray(d2), ratio=0.7)
    good_cv = {}
    for m, n in knn:
        if m.distance < 0.7 * n.distance:
            good_cv[m.queryIdx] = m.trainIdx
    ours = {int(i): int(res.indices[i]) for i in range(100) if bool(res.mask[i])}
    assert ours == good_cv
    # distances agree with cv2's L2
    # f32 ||a||^2+||b||^2-2ab loses ~3 digits vs cv2's direct subtraction.
    for m, n in knn:
        np.testing.assert_allclose(float(res.distance[m.queryIdx]), m.distance, rtol=2e-3)
        np.testing.assert_allclose(float(res.second[m.queryIdx]), n.distance, rtol=2e-3)


def test_masked_padding_rows_never_match(rng):
    d1 = rng.normal(size=(32, 64)).astype(np.float32)
    d2 = rng.normal(size=(32, 64)).astype(np.float32)
    v1 = np.ones(32, bool); v1[20:] = False
    v2 = np.ones(32, bool); v2[10:] = False
    res = M.knn2_match(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2), ratio=0.99)
    assert not np.asarray(res.mask)[20:].any()
    assert np.asarray(res.indices)[np.asarray(res.mask)].max() < 10


def test_mutual_check(rng):
    d1 = rng.normal(size=(16, 32)).astype(np.float32)
    d2 = np.vstack([d1[:8] + 0.01 * rng.normal(size=(8, 32)).astype(np.float32), rng.normal(size=(8, 32)).astype(np.float32)])
    res = M.knn2_match(jnp.asarray(d1), jnp.asarray(d2.astype(np.float32)), ratio=0.95, mutual=True)
    idx = np.asarray(res.indices)
    msk = np.asarray(res.mask)
    assert (idx[:8][msk[:8]] == np.arange(8)[msk[:8]]).all()
