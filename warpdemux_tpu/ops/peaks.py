"""Batched peak picking with scipy.signal.find_peaks(distance=...) parity.

The reference selects changepoints with
`find_peaks(scores, distance=min_obs_per_base)` followed by keeping the
`num_events` highest-scoring peaks (reference: warpdemux/sig_proc.py:176-198).
That is the ranking that decides which events exist, so we replicate scipy's
exact semantics in masked, batched JAX form:

1. local maxima with plateau-midpoint handling (scipy `_local_maxima_1d`):
   a peak is a maximal run x[s..e] of equal values with x[s-1] < v, x[e+1] < v,
   s >= 1, e <= n-2; its position is (s+e)//2.
2. distance suppression (scipy `_select_by_peak_distance`): visit peaks from
   highest score to lowest; a still-kept peak suppresses all peaks strictly
   within `distance` samples.
3. top-k by score (the reference's np.argsort(scores)[-k:]).

Tie order caveat: scipy/numpy use an *unstable* quicksort for the priority
argsort, so the visiting order of exactly-equal scores is an implementation
detail that cannot be reproduced portably. We use a stable sort with
later-position-first tie order — deterministic, and equivalent to scipy
whenever peak scores are unique (t-test scores of real signal are continuous;
exact ties essentially only arise on synthetic/quantized inputs).

Suppression visits are inherently sequential (a suppressed peak never
suppresses others) but each visit touches only a bounded neighbor window, so
the loop body is a tiny vectorized gather/scatter over the whole batch; the
batch dimension keeps the VPU busy while the loop runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = 2**30  # plain int: a captured device-array constant would pin a backend


def local_maxima_batch(
    scores: jnp.ndarray, n_scores: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plateau-aware local maxima per row.

    Args:
      scores: (B, L); n_scores: (B,) valid length per row.

    Returns:
      peak_pos: (B, K) int32 positions sorted ascending, padded with sentinel.
        K = L//2 + 1 (max possible peaks).
      peak_count: (B,) int32.
    """
    B, L = scores.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    # lastdiff[i] = largest j < i with x[j] != x[i]  (-1 if none) — a cummax of
    # (i-1 where x[i] != x[i-1]) since plateau runs share the same lastdiff.
    xl = jnp.concatenate([scores[:, :1], scores[:, :-1]], axis=1)
    changed = scores != xl
    changed = changed.at[:, 0].set(False)
    cand = jnp.where(changed, pos - 1, -1)
    lastdiff = jax.lax.associative_scan(jnp.maximum, cand, axis=1)

    # right edge e: x[e+1] < x[e]; left neighbor x[lastdiff] < x[e]; s>=1; e<=n-2
    xr = jnp.concatenate([scores[:, 1:], scores[:, -1:]], axis=1)
    left_val = jnp.take_along_axis(scores, jnp.maximum(lastdiff, 0), axis=1)
    is_edge = (
        (xr < scores)
        & (lastdiff >= 0)
        & (left_val < scores)
        & (pos <= n_scores[:, None] - 2)
    )
    mid = (lastdiff + 1 + pos) // 2

    # Compact edge midpoints to the front of a fixed-size buffer.
    K = L // 2 + 1
    rank = jnp.cumsum(is_edge.astype(jnp.int32), axis=1) - 1
    peak_count = jnp.sum(is_edge, axis=1).astype(jnp.int32)
    buf = jnp.full((B, K + 1), _SENTINEL, jnp.int32)
    scatter_idx = jnp.where(is_edge, rank, K)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    buf = buf.at[rows, scatter_idx].min(jnp.where(is_edge, mid, _SENTINEL))
    return buf[:, :K], peak_count


def suppress_by_distance(
    peak_pos: jnp.ndarray,
    peak_scores: jnp.ndarray,
    peak_count: jnp.ndarray,
    distance: jnp.ndarray,
    max_distance: int,
) -> jnp.ndarray:
    """scipy `_select_by_peak_distance` on a padded peak buffer.

    Args:
      peak_pos: (B, K) ascending positions, sentinel-padded.
      peak_scores: (B, K) scores at peaks (-inf at padding).
      peak_count: (B,) valid counts.
      distance: (B,) per-row distance (int, >= 1).
      max_distance: static bound on distance (sets the neighbor window).

    Returns:
      keep: (B, K) bool.
    """
    B, K = peak_pos.shape
    # Peaks are >= 2 samples apart, so within `distance` there are at most
    # distance//2 neighbors on each side.
    W = max(1, max_distance // 2 + 1)

    # Highest score first; ties -> later position first (np.argsort stable
    # ascending, reversed).
    order = jnp.argsort(peak_scores, axis=1, stable=True)[:, ::-1]

    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) < peak_count[:, None]
    )
    keep = valid
    rows = jnp.arange(B, dtype=jnp.int32)
    offsets = jnp.array(
        [o for o in range(-W, W + 1) if o != 0], dtype=jnp.int32
    )  # (2W,)

    def body(k, keep):
        j = order[:, k]  # (B,)
        keep_j = keep[rows, j]
        pos_j = peak_pos[rows, j]
        nb = j[:, None] + offsets[None, :]  # (B, 2W)
        in_bounds = (nb >= 0) & (nb < K)
        nb_c = jnp.clip(nb, 0, K - 1)
        nb_pos = peak_pos[rows[:, None], nb_c]
        close = jnp.abs(nb_pos - pos_j[:, None]) < distance[:, None]
        suppress = keep_j[:, None] & in_bounds & close
        return keep.at[rows[:, None], nb_c].min(~suppress)

    max_peaks = jnp.max(peak_count)
    keep = jax.lax.fori_loop(0, max_peaks, body, keep)
    return keep & valid


def find_peaks_batch(
    scores: jnp.ndarray,
    n_scores: jnp.ndarray,
    distance: jnp.ndarray,
    max_distance: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """scipy.signal.find_peaks(scores_row, distance=distance_row) per row.

    Returns (peak_pos, peak_count): surviving peaks, ascending, sentinel-padded.
    """
    peak_pos, peak_count = local_maxima_batch(scores, n_scores)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    B, K = peak_pos.shape
    valid = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) < peak_count[:, None]
    pos_c = jnp.where(valid, peak_pos, 0)
    peak_scores = jnp.where(
        valid, jnp.take_along_axis(scores, pos_c, axis=1), neg_inf
    )
    keep = suppress_by_distance(
        peak_pos, peak_scores, peak_count, distance, max_distance
    )
    # Compact kept peaks forward (positions stay ascending).
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    new_count = jnp.sum(keep, axis=1).astype(jnp.int32)
    buf = jnp.full((B, K + 1), _SENTINEL, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
    scatter_idx = jnp.where(keep, rank, K)
    buf = buf.at[rows, scatter_idx].min(jnp.where(keep, peak_pos, _SENTINEL))
    return buf[:, :K], new_count


def select_top_peaks(
    scores: jnp.ndarray,
    peak_pos: jnp.ndarray,
    peak_count: jnp.ndarray,
    num_events: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Keep the num_events highest-scoring peaks (reference sig_proc.py:185-188).

    Tie behavior matches np.argsort(scores[peaks])[-num_events:]: equal scores
    prefer the later peak. Returns (sel_pos (B, num_events) int32 unsorted,
    ok (B,) = peak_count >= num_events). Rows with ok=False contain clamped
    garbage and must be masked by the caller.
    """
    B, K = peak_pos.shape
    valid = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) < peak_count[:, None]
    pos_c = jnp.where(valid, peak_pos, 0)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    pscores = jnp.where(valid, jnp.take_along_axis(scores, pos_c, axis=1), neg_inf)
    order = jnp.argsort(pscores, axis=1, stable=True)[:, ::-1]
    sel_idx = order[:, :num_events]
    sel_pos = jnp.take_along_axis(pos_c, sel_idx, axis=1)
    ok = peak_count >= num_events
    return sel_pos, ok
