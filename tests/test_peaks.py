import numpy as np
import jax.numpy as jnp
from scipy.signal import find_peaks

from warpdemux_tpu.ops.peaks import find_peaks_batch, select_top_peaks


def _run_find_peaks(signals, n_valid, distance, max_distance=None):
    signals = np.asarray(signals, np.float64)
    B, L = signals.shape
    md = max_distance or int(np.max(distance))
    pos, cnt = find_peaks_batch(
        jnp.asarray(signals),
        jnp.asarray(n_valid, np.int32),
        jnp.asarray(distance, np.int32),
        max_distance=md,
    )
    return np.asarray(pos), np.asarray(cnt)


def test_simple_peaks_match_scipy():
    rng = np.random.default_rng(0)
    B, L = 16, 200
    x = rng.normal(size=(B, L))
    n = np.full(B, L)
    d = np.full(B, 5)
    pos, cnt = _run_find_peaks(x, n, d)
    for b in range(B):
        want, _ = find_peaks(x[b], distance=5)
        got = pos[b, : cnt[b]]
        np.testing.assert_array_equal(got, want)


def test_plateau_peaks_match_scipy():
    # Plateaus (runs of exactly equal values) with *unique* levels so the
    # scipy-vs-stable tie-order caveat doesn't apply.
    rng = np.random.default_rng(1)
    B, L = 16, 300
    x = np.empty((B, L))
    for b in range(B):
        row = []
        while sum(len(r) for r in row) < L:
            row.append(np.full(rng.integers(1, 6), rng.normal()))
        x[b] = np.concatenate(row)[:L]
    n = np.full(B, L)
    for dist in (1, 2, 7, 15):
        d = np.full(B, dist)
        pos, cnt = _run_find_peaks(x, n, d, max_distance=15)
        for b in range(B):
            want, _ = find_peaks(x[b], distance=dist)
            np.testing.assert_array_equal(pos[b, : cnt[b]], want)


def test_masked_lengths_match_scipy():
    rng = np.random.default_rng(2)
    B, L = 12, 256
    x = rng.normal(size=(B, L))
    n = rng.integers(10, L + 1, size=B)
    d = rng.integers(1, 12, size=B)
    pos, cnt = _run_find_peaks(x, n, d, max_distance=12)
    for b in range(B):
        want, _ = find_peaks(x[b, : n[b]], distance=int(d[b]))
        np.testing.assert_array_equal(pos[b, : cnt[b]], want)


def test_near_tie_priority_matches_scipy():
    # Unique near-tie heights within suppression distance exercise priority
    # ordering without hitting the unstable-sort tie caveat.
    B, L = 1, 64
    x = np.zeros((B, L))
    x[0, [5, 8, 11, 20, 23]] = [1.0, 1.0 + 1e-9, 1.0 - 1e-9, 1.0 + 2e-9, 1.0]
    pos, cnt = _run_find_peaks(x, np.array([L]), np.array([4]))
    want, _ = find_peaks(x[0], distance=4)
    np.testing.assert_array_equal(pos[0, : cnt[0]], want)


def test_exact_ties_are_deterministic():
    # On exact ties our stable later-position-first order is the contract.
    B, L = 1, 64
    x = np.zeros((B, L))
    x[0, [5, 8, 11]] = 1.0
    pos, cnt = _run_find_peaks(x, np.array([L]), np.array([4]))
    # 11 processed first (later position), suppresses 8; 5 survives (dist 6 >= 4? no:
    # |11-5|=6 >= 4 -> kept).
    np.testing.assert_array_equal(pos[0, : cnt[0]], [5, 11])


def test_select_top_peaks_tie_behavior():
    # np.argsort(scores[peaks])[-k:]: ties prefer the later peak.
    scores = np.zeros((1, 50))
    peaks = np.array([[5, 10, 15, 20]], np.int32)
    scores[0, [5, 10, 15, 20]] = [2.0, 1.0, 1.0, 3.0]
    sel, ok = select_top_peaks(
        jnp.asarray(scores), jnp.asarray(peaks), jnp.asarray([4], np.int32), 3
    )
    assert bool(ok[0])
    want = peaks[0][np.argsort(scores[0, peaks[0]], kind="stable")[-3:]]
    assert set(np.asarray(sel[0]).tolist()) == set(want.tolist())


def test_random_stress_vs_scipy():
    rng = np.random.default_rng(3)
    for trial in range(5):
        B, L = 8, 400
        x = rng.normal(size=(B, L)).cumsum(axis=1)
        n = rng.integers(50, L + 1, size=B)
        d = rng.integers(1, 18, size=B)
        pos, cnt = _run_find_peaks(x, n, d, max_distance=18)
        for b in range(B):
            want, _ = find_peaks(x[b, : n[b]], distance=int(d[b]))
            np.testing.assert_array_equal(pos[b, : cnt[b]], want)
