"""Fused Pallas cost+box producer: bit-exact parity vs the XLA path."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.ops import disparity as dp
from stereo_reconstruction_cv_tpu.ops.pallas.cost_pallas import cost_volume_pallas


def _planes(rng, H, W):
    base = rng.uniform(0, 255, size=(H, W + 40)).astype(np.float32)
    left = base[:, 40:].astype(np.uint8)
    right = base[:, :-40].astype(np.uint8)
    cap = 63
    sl = dp.xsobel_clip(jnp.asarray(left), cap)
    sr = dp.xsobel_clip(jnp.asarray(right), cap)
    capv = jnp.int32(cap)
    out = []
    for p in (sl, sr, jnp.asarray(left, jnp.int32), jnp.asarray(right, jnp.int32)):
        out.append(p.at[:, 0].set(capv).at[:, -1].set(capv))
    return out


@pytest.mark.parametrize(
    "H,W,D,mind",
    [
        # All interpret-mode cases are ~35-50 s regardless of size (fixed
        # per-grid-step interpretation cost); the fast tier relies on the
        # per-round hardware artifact (docs/HW_PARITY.json) for this
        # kernel and the full goldens run in the slow tier.
        pytest.param(16, 144, 32, 0, marks=pytest.mark.slow),
        pytest.param(24, 200, 32, 0, marks=pytest.mark.slow),  # single strip, small D
        pytest.param(40, 360, 64, 0, marks=pytest.mark.slow),  # strip boundary crosses Wc
        pytest.param(24, 600, 128, 0, marks=pytest.mark.slow),  # two strips
        pytest.param(24, 300, 32, 16, marks=pytest.mark.slow),  # nonzero min_disparity
    ],
)
def test_cost_volume_pallas_bitexact(rng, H, W, D, mind):
    sl, sr, rawl, rawr = _planes(rng, H, W)
    ref = dp.bt_cost_volume(sl, sr, rawl, rawr, D, mind)
    x0 = mind + D
    ref = dp.block_sum(ref[:, x0:, :], 11)
    got = cost_volume_pallas(sl, sr, rawl, rawr, D, mind, interpret=True)
    assert got.dtype == jnp.int16
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
