"""Pallas SGM sweeps (interpret mode on CPU) vs the XLA scan reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops.pallas.sgm_pallas import (
    _sweep_vertical,
    _sweep_vertical_tiled,
    sgm_aggregate_pallas,
    sgm_wta_pallas,
)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("shape", [(24, 64, 16), pytest.param((27, 57, 16), marks=pytest.mark.slow)])  # incl. unpadded
def test_column_tiled_vertical_bitexact(rng, shape, reverse):
    """The column-tiled vertical sweep (the 4K path) == the full-width one,
    including diagonal carries crossing the forced 16-column tiles."""
    C = jnp.asarray(rng.integers(0, 20000, size=shape), dtype=jnp.int16)
    p1, p2 = 2904.0, 11616.0
    ref = _sweep_vertical(C, p1, p2, reverse=reverse, interpret=True)
    out = _sweep_vertical_tiled(C, p1, p2, reverse=reverse, interpret=True,
                                tile_width=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
@pytest.mark.parametrize("ndirs", [pytest.param(5, marks=pytest.mark.slow), 8])
@pytest.mark.parametrize("shape", [(24, 32, 16), pytest.param((30, 41, 16), marks=pytest.mark.slow)])  # incl. unpadded
def test_bitexact_vs_xla(rng, ndirs, shape):
    C = jnp.asarray(rng.integers(0, 20000, size=shape), dtype=jnp.int32)
    p1, p2 = 2904, 11616
    dirs = DP.DIRS_5 if ndirs == 5 else DP.DIRS_8
    ref = DP.sgm_aggregate(C, p1, p2, dirs, None, 32)
    out = sgm_aggregate_pallas(C, p1, p2, ndirs, interpret=True)
    assert jnp.array_equal(ref, out), int(jnp.abs(ref - out).max())


@pytest.mark.parametrize("ndirs", [5, pytest.param(8, marks=pytest.mark.slow)])
@pytest.mark.parametrize("shape", [(24, 32, 16), pytest.param((30, 41, 16), marks=pytest.mark.slow)])
def test_wta_fused_matches_xla(rng, ndirs, shape):
    """sgm_wta_pallas == wta_disparity(sgm_aggregate(...)) + lr maps."""
    C = jnp.asarray(rng.integers(0, 20000, size=shape), dtype=jnp.int32)
    p1, p2 = 2904, 11616
    min_disp, uq = 3, 10
    dirs = DP.DIRS_5 if ndirs == 5 else DP.DIRS_8
    S = DP.sgm_aggregate(C, p1, p2, dirs, None, 32)
    disp_ref, valid_ref = DP.wta_disparity(S, min_disp, uq)
    best_ref = jnp.argmin(S, axis=-1)
    mins_ref = jnp.min(S, axis=-1)
    disp, valid, best, minS = sgm_wta_pallas(
        C, p1, p2, ndirs, uq, min_disp, interpret=True
    )
    np.testing.assert_allclose(np.asarray(disp), np.asarray(disp_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
    np.testing.assert_array_equal(np.asarray(best), np.asarray(best_ref))
    np.testing.assert_array_equal(np.asarray(minS), np.asarray(mins_ref))
    # The full-map lr check consumes these outputs identically.
    lr_ref = DP.lr_check(S, disp_ref, min_disp, 1)
    lr_new = DP.lr_check_maps(best, minS, disp, shape[-1], min_disp, 1)
    np.testing.assert_array_equal(np.asarray(lr_new), np.asarray(lr_ref))
    # ... and so does the Pallas kernel version.
    from stereo_reconstruction_cv_tpu.ops.pallas.lr_pallas import (
        lr_check_maps_pallas,
    )

    lr_pl = lr_check_maps_pallas(best, minS, disp, shape[-1], min_disp, 1,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(lr_pl), np.asarray(lr_ref))
