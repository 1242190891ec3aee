"""Pallas DTW kernel vs the jnp/numpy references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.ops.dtw import dtw_distance_matrix_ref
from warpdemux_tpu.ops.dtw_pallas import dtw_distance_matrix_pallas


def test_pallas_matches_reference_small():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(5, 25)).astype(np.float32)
    Y = rng.normal(size=(9, 25)).astype(np.float32)
    want = dtw_distance_matrix_ref(X.astype(np.float64), Y.astype(np.float64), 15, 0.1)
    got = np.asarray(
        dtw_distance_matrix_pallas(
            jnp.asarray(X), jnp.asarray(Y), 15, 0.1, b_tile=8, n_tile=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pallas_matches_reference_tiled():
    # Shapes that exercise padding on both axes and multiple grid tiles.
    rng = np.random.default_rng(1)
    X = rng.normal(size=(19, 25)).astype(np.float32)
    Y = rng.normal(size=(300, 25)).astype(np.float32)
    want = dtw_distance_matrix_ref(X.astype(np.float64), Y.astype(np.float64), 15, 0.1)
    got = np.asarray(
        dtw_distance_matrix_pallas(
            jnp.asarray(X), jnp.asarray(Y), 15, 0.1, b_tile=8, n_tile=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pallas_window_and_penalty_variants():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(4, 25)).astype(np.float32)
    Y = rng.normal(size=(17, 25)).astype(np.float32)
    for window, penalty in [(1, 0.0), (5, 0.5), (25, 1.5)]:
        want = dtw_distance_matrix_ref(
            X.astype(np.float64), Y.astype(np.float64), window, penalty
        )
        got = np.asarray(
            dtw_distance_matrix_pallas(
                jnp.asarray(X), jnp.asarray(Y), window, penalty,
                b_tile=8, n_tile=128, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
