"""Independent golden for the psi-relaxed subsequence DTW (VERDICT r2 #4).

The tRNA path's sig_barcode_start and consensus-outlier gate hang off
ops/subsequence.py, which reproduces dtaidistance's
warping_paths_fast(penalty=1.5, psi=(psi_1b, 0, psi_2b, 0), psi_neg=False)
+ SubsequenceAlignment best_match (reference warpdemux/sig_proc.py:288-308).

This file pins those semantics with a definition-level enumerator that
shares NO code or recurrence with the production wavefront or its scalar
reference: every monotone warping path is walked explicitly. Semantics
being pinned:

- local cost (q[i]-s[j])^2; penalty^2 added per non-diagonal step
  (dtaidistance squares the user-facing penalty because costs are squared),
- psi start relaxation: a path may enter at query row 1 having skipped up
  to psi_2b leading series elements for free, or at series column 1 having
  skipped up to psi_1b leading query elements for free,
- psi_1e = psi_2e = 0 (the shipped config): the query end is anchored — a
  path must end in the last query row; the series end stays free because
  the subsequence matching function scans the whole last row,
- matching(j) = sqrt(best path cost ending at (r, j)) / r; best end =
  argmin (first on ties); matched segment start = number of series
  elements skipped at entry (0 for query-skip entries),
- psi_neg=False only affects how end-relaxed cells are reported in the
  returned matrix; with psi_2e=0 there are none, so it is a no-op here.

Exponential enumeration — tiny series only.
"""

import numpy as np
import pytest


def _brute_force_subseq(q, s, penalty, psi):
    """Enumerate every monotone path; returns (start, end, dist) exactly as
    SubsequenceAlignment.best_match().segment + matching value."""
    r, c = len(q), len(s)
    p2 = penalty * penalty
    psi_1b, psi_1e, psi_2b, psi_2e = psi
    assert psi_1e == 0 and psi_2e == 0, "shipped config anchors both ends"
    # best cost of any path ending at (r, j_end), 1-based j_end, plus the
    # series-skip count of the path achieving it
    best = np.full(c + 1, np.inf)
    best_start = np.full(c + 1, -1, int)

    def cell(i, j):
        return (q[i - 1] - s[j - 1]) ** 2

    def walk(i, j, acc, start):
        if i == r:
            if acc < best[j]:
                best[j] = acc
                best_start[j] = start
        # expand
        if i + 1 <= r and j + 1 <= c:
            walk(i + 1, j + 1, acc + cell(i + 1, j + 1), start)
        if i + 1 <= r:
            walk(i + 1, j, acc + p2 + cell(i + 1, j), start)
        if j + 1 <= c:
            walk(i, j + 1, acc + p2 + cell(i, j + 1), start)

    # entries via the relaxed series start (row 0 zeros): skipped = j0-1
    for j0 in range(1, min(psi_2b + 1, c) + 1):
        walk(1, j0, cell(1, j0), j0 - 1)
    # entries one row down with a vertical step from a row-0 zero
    for j0 in range(1, min(psi_2b, c) + 1):
        walk(1, j0, cell(1, j0) + p2, j0)
    # entries via the relaxed query start (column 0 zeros): start = 0
    for i0 in range(1, min(psi_1b + 1, r) + 1):
        walk(i0, 1, cell(i0, 1), 0)
    for i0 in range(1, min(psi_1b, r) + 1):
        walk(i0, 1, cell(i0, 1) + p2, 0)

    matching = np.sqrt(best[1:]) / r
    j_star = int(np.argmin(matching)) + 1
    return int(best_start[j_star]), j_star, float(matching[j_star - 1])


def _cases(rng, n_cases):
    for _ in range(n_cases):
        r = int(rng.integers(2, 5))
        c = int(rng.integers(3, 8))
        q = rng.normal(0, 1, r)
        s = rng.normal(0, 1, c)
        penalty = float(rng.choice([0.0, 0.1, 1.5]))
        psi_1b = int(rng.choice([0, 1, 2, 5]))
        psi_2b = int(rng.choice([0, 2, 5, 40]))
        yield q, s, penalty, (psi_1b, 0, psi_2b, 0)


def test_scalar_ref_matches_brute_force():
    from warpdemux_tpu.ops.subsequence import subsequence_dtw_ref

    rng = np.random.default_rng(11)
    for idx, (q, s, penalty, psi) in enumerate(_cases(rng, 60)):
        want = _brute_force_subseq(q, s, penalty, psi)
        got = subsequence_dtw_ref(q, s, penalty, psi)
        assert got[1] == want[1], (idx, got, want)
        assert got[0] == want[0], (idx, got, want)
        np.testing.assert_allclose(got[2], want[2], rtol=1e-9, err_msg=str(idx))


def test_production_batch_matches_brute_force():
    import jax.numpy as jnp

    from warpdemux_tpu.ops.subsequence import subsequence_dtw_batch

    rng = np.random.default_rng(23)
    # group cases by (penalty, psi, series length C) into batches with
    # varying valid lengths to exercise the masking
    for penalty, psi in [(1.5, (5, 0, 40, 0)), (0.1, (2, 0, 3, 0)),
                         (0.0, (0, 0, 0, 0))]:
        B, C, m = 6, 9, 3
        q = rng.normal(0, 1, m)
        series = rng.normal(0, 1, (B, C)).astype(np.float32)
        lens = rng.integers(4, C + 1, B).astype(np.int32)
        start, end, dist = subsequence_dtw_batch(
            jnp.asarray(q, jnp.float32), jnp.asarray(series),
            jnp.asarray(lens), penalty=penalty, psi=psi,
        )
        for b in range(B):
            want = _brute_force_subseq(
                q.astype(np.float32), series[b, : lens[b]], penalty, psi
            )
            assert int(end[b]) == want[1], (penalty, psi, b)
            assert int(start[b]) == want[0], (penalty, psi, b)
            np.testing.assert_allclose(
                float(dist[b]), want[2], rtol=1e-5, err_msg=f"{penalty} {b}"
            )


def test_hand_computed_fixtures():
    """Spot checks a human can verify on paper."""
    from warpdemux_tpu.ops.subsequence import subsequence_dtw_ref

    # 1. pure series-skip: q matches s[2:4] exactly after skipping 2 <=
    #    psi_2b leading elements -> start 2, end 4, dist 0
    got = subsequence_dtw_ref([1.0, 2.0], [9.0, 9.0, 1.0, 2.0, 9.0], 1.5,
                              (0, 0, 2, 0))
    assert got == (2, 4, 0.0)

    # 2. penalty placement & squaring: q=[5,5] vs s=[5] forces one vertical
    #    step -> cost = penalty^2 -> dist = sqrt(1.5^2)/2 = 0.75 (an
    #    unsquared penalty would give sqrt(1.5)/2 ~= 0.612)
    got = subsequence_dtw_ref([5.0, 5.0], [5.0], 1.5, (0, 0, 0, 0))
    assert got[0] == 0 and got[1] == 1
    np.testing.assert_allclose(got[2], 0.75, rtol=1e-12)

    # 3. query-start relaxation: skipping the leading q element (7) is free
    #    with psi_1b=1 -> perfect match, start reported as 0 (query-skip
    #    entries carry no series skip)
    got = subsequence_dtw_ref([7.0, 1.0, 2.0], [1.0, 2.0], 1.5, (1, 0, 0, 0))
    assert got[0] == 0 and got[1] == 2
    np.testing.assert_allclose(got[2], 0.0, atol=1e-12)

    # 4. without the query-start relaxation the same match is imperfect
    got = subsequence_dtw_ref([7.0, 1.0, 2.0], [1.0, 2.0], 1.5, (0, 0, 0, 0))
    assert got[2] > 1.0

    # 5. the shipped config's psi values behave on a longer series: penalty
    #    discourages the vertical stutter (q[0] matched twice costs p^2)
    q = [1.0, 3.0]
    s = [9.0, 1.0, 1.0, 3.0, 9.0]
    got = subsequence_dtw_ref(q, s, 1.5, (5, 0, 40, 0))
    # best: skip 2 (free), diag (1->1), right-stutter... enumerate by hand:
    # path A: enter j0=2 (skip 1): cells (1,2)=0, horiz (1,3)=0+p2, diag
    #   (2,4)=0 -> cost p2=2.25
    # path B: enter j0=3 (skip 2): cells (1,3)=0, diag (2,4)=0 -> cost 0
    assert got == (2, 4, 0.0)
