"""Pallas SGM sweeps (interpret mode on CPU) vs the XLA scan reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops.pallas.sgm_pallas import sgm_aggregate_pallas


@pytest.mark.parametrize("ndirs", [5, 8])
@pytest.mark.parametrize("shape", [(24, 32, 16), (30, 41, 16)])  # incl. unpadded
def test_bitexact_vs_xla(rng, ndirs, shape):
    C = jnp.asarray(rng.integers(0, 20000, size=shape), dtype=jnp.int32)
    p1, p2 = 2904, 11616
    dirs = DP.DIRS_5 if ndirs == 5 else DP.DIRS_8
    ref = DP.sgm_aggregate(C, p1, p2, dirs, None, 32)
    out = sgm_aggregate_pallas(C, p1, p2, ndirs, interpret=True)
    assert jnp.array_equal(ref, out), int(jnp.abs(ref - out).max())
