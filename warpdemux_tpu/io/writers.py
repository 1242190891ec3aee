"""Sharded output writers matching the reference's file contract.

Output layout (reference warpdemux/config/file_proc.py:19-49,
file_proc.py:633-780):
  <run>/predictions/barcode_predictions_<bidx>.csv.gz   (#read_id first col)
  <run>/failed_reads/failed_reads_<bidx>.csv.gz
  <run>/boundaries/detected_boundaries_<bidx>.csv.gz
  <run>/fingerprints/barcode_fpts_<bidx>.npz            (num_reads, read_ids,
                                                         signals[, dwell_times])
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

# Boundary/failed-read summary columns (the reference's ADAPTed
# save_detected_boundaries contract, README.md:425-457).
BOUNDARY_COLUMNS = [
    "read_id",
    "signal_len",
    "preloaded",
    "adapter_start",
    "adapter_end",
    "adapter_len",
    "adapter_mean",
    "adapter_std",
    "adapter_med",
    "adapter_mad",
    "polya_start",
    "polya_end",
    "polya_len",
    "polya_mean",
    "polya_std",
    "polya_med",
    "polya_mad",
    "polya_candidates",
    "rna_preloaded_start",
    "rna_preloaded_len",
    "rna_preloaded_mean",
    "rna_preloaded_std",
    "rna_preloaded_med",
    "rna_preloaded_mad",
    "adapter_dt_med",
    "adapter_dt_mad",
    "adapter_event_mean",
    "adapter_event_std",
    "adapter_event_med",
    "adapter_event_mad",
]


def save_predictions(
    df: pd.DataFrame, out_dir: str | Path, bidx: int, tag: str = ""
) -> Path:
    path = Path(out_dir) / f"barcode_predictions_{tag}{bidx}.csv.gz"
    df.to_csv(path, index=False, compression="gzip")
    return path


def save_boundaries(
    rows: pd.DataFrame,
    out_dir: str | Path,
    bidx: int,
    failed: bool = False,
    tag: str = "",
) -> Path:
    name = "failed_reads" if failed else "detected_boundaries"
    path = Path(out_dir) / f"{name}_{tag}{bidx}.csv.gz"
    rows.to_csv(path, index=False, compression="gzip")
    return path


def save_fingerprints(
    read_ids: np.ndarray,
    fpts: np.ndarray,
    out_dir: str | Path,
    bidx: int,
    dwell_times: np.ndarray | None = None,
    tag: str = "",
) -> Path:
    path = Path(out_dir) / f"barcode_fpts_{tag}{bidx}.npz"
    arrays = dict(
        num_reads=len(read_ids),
        read_ids=np.asarray(read_ids),
        signals=np.asarray(fpts),
    )
    if dwell_times is not None:
        arrays["dwell_times"] = np.asarray(dwell_times)
    np.savez(path, **arrays)
    return path
