"""Tests for the exact linear-kernel changepoint DP (ops/changepoint.py,
the refinement_optimal_cpts capability; reference sig_proc.py:348-354)."""

import numpy as np

from warpdemux_tpu.ops.changepoint import kernel_cpd_linear


def _total_cost(x, bkps, start=0):
    cost = 0.0
    a = start
    for b in bkps:
        seg = x[a:b]
        cost += float(np.sum(seg**2) - seg.sum() ** 2 / seg.size)
        a = b
    return cost


def test_recovers_piecewise_constant_breaks():
    rng = np.random.default_rng(0)
    levels = [0.0, 4.0, -3.0, 2.0]
    segs = [200, 150, 250, 180]
    x = np.concatenate(
        [np.full(n, l) + rng.normal(0, 0.3, n) for l, n in zip(levels, segs)]
    )
    bkps = kernel_cpd_linear(x, n_bkps=3, min_size=10)
    assert bkps[-1] == x.size
    true = np.cumsum(segs)[:-1]
    for t, b in zip(true, bkps[:-1]):
        assert abs(int(b) - int(t)) <= 3, (bkps, true)


def test_optimality_vs_bruteforce():
    rng = np.random.default_rng(1)
    x = rng.normal(size=40)
    x[15:] += 3.0
    x[28:] -= 5.0
    bkps = kernel_cpd_linear(x, n_bkps=2, min_size=3)
    got = _total_cost(x, bkps)
    # brute force all (b1, b2) pairs
    best = np.inf
    for b1 in range(3, 38):
        for b2 in range(b1 + 3, 38):
            if 40 - b2 < 3:
                continue
            best = min(best, _total_cost(x, [b1, b2, 40]))
    assert got <= best + 1e-9, (got, best)


def test_min_size_respected_and_short_input():
    x = np.arange(20.0)
    bkps = kernel_cpd_linear(x, n_bkps=3, min_size=5)
    assert bkps.size == 4
    diffs = np.diff(np.concatenate([[0], bkps]))
    assert (diffs >= 5).all()
    assert kernel_cpd_linear(np.ones(5), n_bkps=3, min_size=5).size == 0
