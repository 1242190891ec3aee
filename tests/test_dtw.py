import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.ops.dtw import (
    dtw_distance_matrix,
    dtw_distance_ref,
    dtw_distance_matrix_ref,
)


def test_trivial_identity():
    s = np.arange(25, dtype=np.float64)
    assert dtw_distance_ref(s, s, 15, 0.1) == 0.0
    d = dtw_distance_matrix(jnp.asarray(s[None]), jnp.asarray(s[None]), 15, 0.1)
    assert float(d[0, 0]) == 0.0


def test_unbanded_matches_classic_dtw():
    # With a full window and zero penalty, DTW reduces to the textbook
    # recurrence; check against an independent full-matrix implementation.
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=25), rng.normal(size=25)
    D = np.full((26, 26), np.inf)
    D[0, 0] = 0
    for i in range(25):
        for j in range(25):
            c = (a[i] - b[j]) ** 2
            D[i + 1, j + 1] = c + min(D[i, j], D[i, j + 1], D[i + 1, j])
    want = np.sqrt(D[25, 25])
    assert np.isclose(dtw_distance_ref(a, b, 25, 0.0), want)
    got = dtw_distance_matrix(jnp.asarray(a[None]), jnp.asarray(b[None]), 25, 0.0)
    assert np.isclose(float(got[0, 0]), want)


def test_band_restricts_path():
    # Tighter bands can only increase the optimal path cost; for a shifted
    # oscillation the diagonal-only band is strictly worse than the full DTW.
    rng = np.random.default_rng(7)
    a = np.sin(np.linspace(0, 12, 25)) + rng.normal(0, 0.05, 25)
    b = np.roll(np.sin(np.linspace(0, 12, 25)), 6) + rng.normal(0, 0.05, 25)
    d1 = dtw_distance_ref(a, b, 1, 0.0)
    d3 = dtw_distance_ref(a, b, 3, 0.0)
    d25 = dtw_distance_ref(a, b, 25, 0.0)
    assert d1 >= d3 >= d25
    assert d1 > d25


def test_penalty_increases_warped_distance():
    a = np.sin(np.linspace(0, 3, 25))
    b = np.sin(np.linspace(0.3, 3.3, 25))
    d0 = dtw_distance_ref(a, b, 15, 0.0)
    d1 = dtw_distance_ref(a, b, 15, 1.0)
    assert d1 > d0


def test_jnp_matches_numpy_reference_randomized():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(7, 25))
    Y = rng.normal(size=(11, 25))
    for window, penalty in [(15, 0.1), (5, 0.0), (25, 1.5), (1, 0.1)]:
        want = dtw_distance_matrix_ref(X, Y, window, penalty)
        got = np.asarray(
            dtw_distance_matrix(jnp.asarray(X), jnp.asarray(Y), window, penalty)
        )
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_window_one_is_diagonal_only():
    rng = np.random.default_rng(2)
    a, b = rng.normal(size=25), rng.normal(size=25)
    want = np.sqrt(np.sum((a - b) ** 2))
    assert np.isclose(dtw_distance_ref(a, b, 1, 0.7), want)
    got = dtw_distance_matrix(jnp.asarray(a[None]), jnp.asarray(b[None]), 1, 0.7)
    assert np.isclose(float(got[0, 0]), want)


def test_distance_matrix_to_api():
    """Drop-in API (reference parallel_distances.py:48-84): block_size and
    n_jobs accepted and ignored; numpy in/out."""
    import numpy as np

    from warpdemux_tpu.ops import distance_matrix_to

    rng = np.random.default_rng(0)
    X = rng.normal(size=(6, 25)).astype(np.float32)
    Y = rng.normal(size=(9, 25)).astype(np.float32)
    D = distance_matrix_to(X, Y, window=15, penalty=0.1, block_size=500, n_jobs=4)
    assert isinstance(D, np.ndarray) and D.shape == (6, 9)
    D_self = distance_matrix_to(X, X)
    np.testing.assert_allclose(np.diag(D_self), 0.0, atol=1e-6)


def _brute_force_dtw(q, r, window, penalty):
    """Definition-level golden: enumerate EVERY monotone warping path.

    Semantics being pinned (dtaidistance 2.3.13's banded DTW as used by the
    reference, parallel_distances.py:34-43): local cost = squared
    difference, steps = (i+1,j+1) free / (i+1,j) / (i,j+1) with penalty^2
    added on the two non-diagonal steps, Sakoe-Chiba band |i-j| <= window-1,
    path from (0,0) to (n-1,m-1), final distance = sqrt(total). Exponential
    enumeration — only for tiny series — but shares NO code or recurrence
    with the production implementations, so a misread of the recurrence in
    one cannot hide in the other.
    """
    n, m = len(q), len(r)
    p2 = penalty * penalty
    best = [np.inf]

    def in_band(i, j):
        # dtaidistance widens the Sakoe-Chiba band by the length difference:
        # j in [i - max(0, n-m) - w + 1, i + max(0, m-n) + w) — for equal
        # lengths this is |i-j| <= w-1
        return (
            j >= i - max(0, n - m) - window + 1
            and j < i + max(0, m - n) + window
        )

    def walk(i, j, acc):
        if not in_band(i, j):
            return
        acc += (q[i] - r[j]) ** 2
        if acc >= best[0]:
            return
        if i == n - 1 and j == m - 1:
            best[0] = acc
            return
        if i + 1 < n and j + 1 < m:
            walk(i + 1, j + 1, acc)
        if i + 1 < n:
            walk(i + 1, j, acc + p2)
        if j + 1 < m:
            walk(i, j + 1, acc + p2)

    walk(0, 0, 0.0)
    return np.sqrt(best[0])


def test_all_paths_brute_force_parity():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(3, 7))
        m = int(rng.integers(3, 7))
        window = int(rng.integers(1, 7))
        penalty = float(rng.choice([0.0, 0.1, 1.5]))
        q = rng.normal(0, 1, n)
        r = rng.normal(0, 1, m)
        want = _brute_force_dtw(q, r, window, penalty)
        got = dtw_distance_ref(q, r, window, penalty)
        if np.isinf(want):
            assert np.isinf(got) or got > 1e17, (trial, got)
        else:
            np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=str(trial))
