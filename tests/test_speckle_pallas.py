"""Pallas speckle flood kernels vs the XLA segmented min-flood.

One Pallas round = full-axis flood + block-local transverse flood per
kernel, so a single round converges AT LEAST as far as two
_seg_min_flood passes; the fixpoint — what the speckle filter consumes —
is identical (min-floods are monotone and confluent). The exact-fixpoint
claim is pinned here; cv2.filterSpeckles agreement is pinned by
tests/test_disparity.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops.pallas.speckle_pallas import (
    flood_round_pallas,
)


def _random_speckle_case(seed, H, W, p_invalid=0.4, max_diff=5.0):
    rng = np.random.default_rng(seed)
    disp = (rng.random((H, W)) * 60).astype(np.float32)
    valid = rng.random((H, W)) >= p_invalid
    disp = np.where(valid, disp, 0.0)
    return jnp.asarray(disp), jnp.asarray(valid)


def _flood_fixpoint_xla(lab, ch, cv, big):
    for _ in range(256):
        new = DP._seg_min_flood(lab, ch, axis=1, big=big)
        new = DP._seg_min_flood(new, cv, axis=0, big=big)
        if bool(jnp.all(new == lab)):
            return lab
        lab = new
    raise AssertionError("XLA flood did not converge")


@pytest.mark.parametrize("shape", [
    (48, 256),
    pytest.param((56, 384), marks=pytest.mark.slow),
    pytest.param((128, 128), marks=pytest.mark.slow),
])
def test_flood_round_matches_xla(shape):
    H, W = shape
    disp, valid = _random_speckle_case(0, H, W)
    big = jnp.int32(H * W)
    lab = jnp.where(
        valid, jnp.arange(H * W, dtype=jnp.int32).reshape(H, W), big
    )
    ch = jnp.concatenate(
        [jnp.zeros((H, 1), bool),
         (jnp.abs(disp[:, 1:] - disp[:, :-1]) <= 5.0)
         & valid[:, 1:] & valid[:, :-1]], axis=1)
    cv = jnp.concatenate(
        [jnp.zeros((1, W), bool),
         (jnp.abs(disp[1:, :] - disp[:-1, :]) <= 5.0)
         & valid[1:, :] & valid[:-1, :]], axis=0)
    chi, cvi = ch.astype(jnp.int32), cv.astype(jnp.int32)

    # One Pallas round dominates one XLA round (monotone: labels only
    # decrease, and never below the XLA fixpoint).
    ref1 = DP._seg_min_flood(lab, ch, axis=1, big=big)
    ref1 = DP._seg_min_flood(ref1, cv, axis=0, big=big)
    fix = _flood_fixpoint_xla(lab, ch, cv, big)
    got, changed = flood_round_pallas(lab, chi, cvi, interpret=True)
    assert bool(jnp.all(got <= ref1))
    assert bool(jnp.all(got >= fix))
    assert bool(changed) == bool(jnp.any(got != lab))

    # Iterating the Pallas round converges to the exact XLA fixpoint,
    # and the converged round reports changed == False.
    cur = got
    for _ in range(64):
        if not bool(changed):
            break
        cur, changed = flood_round_pallas(cur, chi, cvi, interpret=True)
    assert not bool(changed)
    assert bool(jnp.all(cur == fix))
    _, changed2 = flood_round_pallas(cur, chi, cvi, interpret=True)
    assert not bool(changed2)


@pytest.mark.slow  # interpret-mode whole-filter run; the kernel itself is
# pinned fast by test_flood_round_matches_xla[shape0]
def test_speckle_filter_backends_agree():
    disp, valid = _random_speckle_case(3, 48, 192)
    import unittest.mock as mock

    import stereo_reconstruction_cv_tpu.ops.pallas.speckle_pallas as SPK

    ref = DP.speckle_filter(disp, valid, 20, 5.0, use_pallas=False)
    # speckle_filter's pallas branch calls flood_round_flagged (r5);
    # patch it to interpret mode so the whole-filter path runs on CPU.
    orig = SPK.flood_round_flagged
    with mock.patch.object(
        SPK, "flood_round_flagged",
        lambda lab, ch, cv, rf, cs: orig(lab, ch, cv, rf, cs, interpret=True),
    ):
        got = DP.speckle_filter(disp, valid, 20, 5.0, use_pallas=True)
    assert bool(jnp.all(got == ref))
