"""Model registry: name -> (barcode count, chemistry, config, arrays).

Mirrors the reference registry (warpdemux/models/model_files/config.toml,
read by models/utils.py:13-16) with models stored as npz array bundles
(see importer.py) instead of sklearn pickles.
"""

from __future__ import annotations

import tomllib
from pathlib import Path

import numpy as np

MODEL_DIR = Path(__file__).parent / "model_files"


def _registry() -> dict:
    with open(MODEL_DIR / "config.toml", "rb") as f:
        return tomllib.load(f)


def available_models() -> list[str]:
    return list(_registry().keys())


def model_config(name: str) -> dict:
    reg = _registry()
    if name not in reg:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(reg)}"
        )
    return reg[name]


def load_model_arrays(name: str) -> dict[str, np.ndarray]:
    path = MODEL_DIR / f"{name}.npz"
    if not path.exists():
        raise FileNotFoundError(
            f"Model arrays not found: {path}. Known registry entries without "
            "shipped arrays (e.g. tRNA models, absent upstream too) cannot be "
            "loaded."
        )
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_model(name: str, dtype=np.float32):
    """Load a model by name into a ready-to-predict model object.

    The bundle's `model_type` field selects the family (reference classes
    DTW_SVM / DTW_MLP / Fpt_Boost, warpdemux/models/); absent means
    dtw_svm (all shipped reference models are DTW_SVM, SURVEY 2.6)."""
    arrays = load_model_arrays(name)
    if bool(arrays.get("stand_in", False)):
        # in-repo-trained replacement for an upstream model whose blob is
        # missing from the reference checkout (e.g. the tRNA joblibs):
        # same form, NOT the published weights — never let a user mistake
        # it for the reference-trained model of the same name
        import logging

        logging.warning(
            "model %r is an in-repo-trained STAND-IN (the upstream model "
            "file is a missing blob in the reference checkout); barcode "
            "calls will not match the published model",
            name,
        )
    mtype = str(arrays.get("model_type", "dtw_svm"))
    if mtype == "dtw_svm":
        from warpdemux_tpu.models.dtw_svm import DTWSVMModel

        return DTWSVMModel.from_arrays(arrays, name=name, dtype=dtype)
    if mtype == "dtw_mlp":
        from warpdemux_tpu.models.dtw_mlp import DTWMLPModel

        return DTWMLPModel.from_arrays(arrays, name=name, dtype=dtype)
    if mtype == "fpt_boost":
        from warpdemux_tpu.models.fpt_boost import FptBoostModel

        return FptBoostModel.from_arrays(arrays, name=name, dtype=dtype)
    raise ValueError(f"unknown model_type {mtype!r} in bundle {name!r}")
