"""Target-performance filtering: per-barcode calibrated confidence
thresholds at chosen precision targets.

The reference ships calibration tables (target_accuracy_thresholds/*.csv:
one row per barcode, one column per precision target 95.0..99.9) and
documents the workflow (README.md:351-369): group predictions by barcode,
apply the threshold for the desired target, demote below-threshold
predictions to -1 (unclassified). The in-model `thresholds` arrays are the
99%-precision operating point and are applied automatically at predict
time (ops/svm.process_probs); this module is the post-prediction surface
for other targets.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

ASSET_DIR = Path(__file__).parent / "target_accuracy_thresholds"


def available_calibrations() -> list[str]:
    return sorted(p.stem for p in ASSET_DIR.glob("*.csv"))


def load_calibration(name: str) -> pd.DataFrame:
    """Load a calibration table; index = true_barcode, columns = targets
    as floats (95.0, 96.0, ... 99.9)."""
    path = ASSET_DIR / f"{name}.csv"
    if not path.exists():
        raise FileNotFoundError(
            f"calibration {name!r} not found; available: "
            f"{available_calibrations()}"
        )
    df = pd.read_csv(path).set_index("true_barcode")
    df.columns = [float(c.replace("_", ".")) for c in df.columns]
    return df


def calibration_for_model(model_name: str) -> pd.DataFrame:
    """Find the calibration asset for a model (prefix match on the
    registry naming scheme, e.g. WDX4_rna004_v1_0 ->
    WDX4_rna004__3_4_5_7@v0.4.4)."""
    base = model_name.rsplit("_v", 1)[0]
    for name in available_calibrations():
        if name.startswith(base):
            return load_calibration(name)
    raise FileNotFoundError(
        f"no calibration table for model {model_name!r}; available: "
        f"{available_calibrations()}"
    )


def thresholds_at(calibration: pd.DataFrame, target: float) -> dict[int, float]:
    """Per-barcode thresholds for a precision target (exact column match)."""
    if target not in calibration.columns:
        raise KeyError(
            f"target {target} not calibrated; available: "
            f"{list(calibration.columns)}"
        )
    return {int(bc): float(v) for bc, v in calibration[target].items()}


def apply_target_performance(
    pred: np.ndarray,
    conf: np.ndarray,
    thresholds: dict[int, float],
) -> np.ndarray:
    """Demote predictions whose confidence is below the per-barcode
    threshold to -1 (README.md:365-369). Barcodes without a calibrated
    threshold are left untouched."""
    pred = np.asarray(pred).copy()
    conf = np.asarray(conf)
    for bc, thr in thresholds.items():
        pred[(pred == bc) & (conf < thr)] = -1
    return pred


def filter_predictions_df(
    df: pd.DataFrame, model_name: str, target: float
) -> pd.DataFrame:
    """Apply target-performance filtering to a predictions table
    (the csv.gz written by the demux/predict pipelines)."""
    cal = calibration_for_model(model_name)
    thr = thresholds_at(cal, target)
    out = df.copy()
    out["predicted_barcode"] = apply_target_performance(
        df["predicted_barcode"].to_numpy(),
        df["confidence_score"].to_numpy(),
        thr,
    )
    return out
