"""Detect-results -> barcode fingerprints, fused and batched.

The reference's per-read `detect_results_to_fpt` (warpdemux/sig_proc.py:394-605)
re-expressed as one fixed-shape device stage:

1. adapter extraction with padding into a fixed (B, A_max) buffer
   (sig_proc.py:382-391; padding from sig_extract.padding),
2. outlier clipping to median +/- thresh*MAD (sig_proc.py:421-431),
3. optional pre-normalization (sig_extract.normalization, "none" in RNA004),
4. event segmentation into num_events changepoints (ops/segmentation.py),
5. mean/std normalization of the event means (segmentation.normalization),
6. barcode fingerprint = last barcode_num_events normalized event means,
   dwell times likewise (sig_proc.py:569-605),
7. adapter event statistics (dt med/mad, event mean/std/med/mad,
   sig_proc.py:562-567).

Failure taxonomy matches the reference: segmentation failure when fewer than
num_events peaks survive (accept_less_cpts=false path).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from warpdemux_tpu.ops.normalize import (
    clip_outliers,
    masked_mean_std,
    masked_median,
    masked_mad,
    normalize,
)
from warpdemux_tpu.ops.segmentation import segment_signal_batch


@dataclass(frozen=True)
class FingerprintConfig:
    # [sig_extract]
    padding: int = 100
    extract_normalization: str = "none"
    # [core]
    sig_norm_outlier_thresh: float = 5.0
    max_obs_adapter: int = 6000
    # [segmentation]
    num_events: int = 110
    min_obs_per_base: int = 6
    running_stat_width: int = 12
    normalization: str = "mean"
    barcode_num_events: int = 25
    accept_less_cpts: bool = False

    @property
    def buffer_len(self) -> int:
        # fixed adapter buffer: max adapter + padding at both ends, rounded
        # up to a lane multiple
        raw = self.max_obs_adapter + 2 * self.padding
        return -(-raw // 128) * 128


class FingerprintArrays(NamedTuple):
    """Batched fingerprint results; (B, ...) arrays."""

    ok: jnp.ndarray  # bool: segmentation + normalization succeeded
    fpt: jnp.ndarray  # (B, barcode_num_events) float
    dwell: jnp.ndarray  # (B, barcode_num_events) int32
    adapter_dt_med: jnp.ndarray
    adapter_dt_mad: jnp.ndarray
    adapter_event_mean: jnp.ndarray
    adapter_event_std: jnp.ndarray
    adapter_event_med: jnp.ndarray
    adapter_event_mad: jnp.ndarray


def extract_adapter_batch(
    signals: jnp.ndarray,
    in_lens: jnp.ndarray,
    adapter_start: jnp.ndarray,
    adapter_end: jnp.ndarray,
    padding: int,
    buffer_len: int,
):
    """Gather [max(0, start-pad), min(len, end+pad)) into a fixed buffer.

    Returns (buffer (B, buffer_len), lengths (B,)).
    """
    from warpdemux_tpu.ops.window_gather import shift_rows_auto

    B, L = signals.shape
    start = jnp.maximum(0, adapter_start - padding)
    end = jnp.minimum(in_lens, adapter_end + padding)
    length = jnp.clip(end - start, 0, buffer_len)
    # right-pad so any start in [0, L] yields a full window for the
    # dynamic-slice kernel; the tail is masked below anyway
    padded = jnp.concatenate(
        [signals, jnp.zeros((B, buffer_len), signals.dtype)], axis=1
    )
    buf = shift_rows_auto(padded, start, buffer_len)
    mask = jnp.arange(buffer_len)[None, :] < length[:, None]
    return jnp.where(mask, buf, 0.0), length


@functools.partial(jax.jit, static_argnames=("cfg",))
def fingerprints_from_boundaries(
    signals: jnp.ndarray,
    in_lens: jnp.ndarray,
    adapter_start: jnp.ndarray,
    adapter_end: jnp.ndarray,
    cfg: FingerprintConfig = FingerprintConfig(),
) -> FingerprintArrays:
    adapter, a_len = extract_adapter_batch(
        signals.astype(jnp.float32),
        in_lens.astype(jnp.int32),
        adapter_start.astype(jnp.int32),
        adapter_end.astype(jnp.int32),
        cfg.padding,
        cfg.buffer_len,
    )
    B, A = adapter.shape
    amask = jnp.arange(A)[None, :] < a_len[:, None]

    adapter = clip_outliers(adapter, amask, cfg.sig_norm_outlier_thresh)
    adapter = jnp.where(amask, adapter, 0.0)
    if cfg.extract_normalization != "none":
        adapter = jnp.where(
            amask, normalize(adapter, amask, cfg.extract_normalization), 0.0
        )

    means, dwell, seg_ok, _, _, _ = segment_signal_batch(
        adapter,
        a_len,
        cfg.num_events,
        cfg.min_obs_per_base,
        cfg.running_stat_width,
    )
    E = means.shape[1]  # num_events + 1
    all_mask = jnp.ones((B, E), bool)

    # normalize event means over ALL events (sig_proc.py:548), then keep the
    # last barcode_num_events as the fingerprint (sig_proc.py:593)
    ev_mean, ev_std = masked_mean_std(means, all_mask)
    norm_ok = ev_std > 0
    norm_means = (means - ev_mean[:, None]) / jnp.where(
        norm_ok, ev_std, 1.0
    )[:, None]

    k = cfg.barcode_num_events
    fpt = norm_means[:, -k:]
    dwell_k = dwell[:, -k:]

    dt_med = masked_median(dwell.astype(jnp.float32), all_mask)
    dt_mad = masked_mad(dwell.astype(jnp.float32), all_mask, dt_med)
    ev_med = masked_median(means, all_mask)
    ev_mad = masked_mad(means, all_mask, ev_med)

    ok = seg_ok & norm_ok
    return FingerprintArrays(
        ok=ok,
        fpt=fpt,
        dwell=dwell_k,
        adapter_dt_med=dt_med,
        adapter_dt_mad=dt_mad,
        adapter_event_mean=ev_mean,
        adapter_event_std=ev_std,
        adapter_event_med=ev_med,
        adapter_event_mad=ev_mad,
    )
