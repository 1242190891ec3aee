"""Convert reference WarpDemuX model joblibs into the neutral npz format.

The reference ships trained models as sklearn pickles
(warpdemux/models/model_files/*.joblib, loaded at file_proc.py:1006-1008).
Pickles are Python/sklearn-version-bound and carry code references; this
framework stores models as plain arrays (npz) that fully describe the
precomputed-kernel SVC predict path (see ops/svm.py):

  X_sv          (n_sv, m)  support-vector fingerprints (pruned to support set)
  dual_coef     (k-1, n_sv)
  n_support     (k,)
  intercept     (P,)       P = k(k-1)/2 one-vs-one pairs
  probA, probB  (P,)       Platt calibration
  label_map     (k,)       prob-column index -> output barcode (-1 = noise)
  thresholds    (k,)       per-class confidence thresholds (99% precision)
  window, penalty, gamma, pwr_dist, block_size, noise_class scalars

Run as a script to convert every model found in a reference checkout:
  python -m warpdemux_tpu.models.importer --reference /root/reference \
      --out warpdemux_tpu/models/model_files
"""

from __future__ import annotations

import argparse
import sys
import types
import warnings
from pathlib import Path

import numpy as np


def _install_unpickle_stubs() -> None:
    """Provide stub classes for the reference's model modules so its pickles
    load as plain attribute bags without importing reference code."""
    stubs = {
        "warpdemux.models.dtw_svm": ["DTW_SVM"],
        "warpdemux.models.dtw_base": ["BaseDTWModel"],
        "warpdemux.models.dtw_mlp": ["DTW_MLP"],
        "warpdemux.models.fpt_boost": ["Fpt_Boost"],
        "warpdemux.models.fpt_base": ["BaseFptModel"],
    }
    for modname, classes in stubs.items():
        parts = modname.split(".")
        for i in range(1, len(parts) + 1):
            mn = ".".join(parts[:i])
            if mn not in sys.modules:
                sys.modules[mn] = types.ModuleType(mn)
        m = sys.modules[modname]
        for c in classes:
            if not hasattr(m, c):
                setattr(m, c, type(c, (), {}))


def arrays_from_svc(
    svc,
    X: np.ndarray,
    label_mapper: dict,
    thresholds,
    window: int = 15,
    penalty: float = 0.1,
    gamma: float = 1.0,
    pwr_dist: int = 1,
    block_size: int = 500,
    noise_class: bool = True,
) -> dict[str, np.ndarray]:
    """Arrays bundle from a fitted sklearn SVC(kernel='precomputed') +
    reference fingerprint set — shared by the joblib importer and the
    in-repo trainers (tools/train_trna_model.py)."""
    X = np.asarray(X, np.float64)
    support = np.asarray(svc.support_, np.int64)
    k = len(svc.classes_)
    label_map = np.array([label_mapper[i] for i in range(k)], np.int32)
    thresholds = np.asarray(thresholds, np.float64)
    if thresholds.shape == ():
        thresholds = np.full(k, float(thresholds))
    return dict(
        X_sv=X[support].astype(np.float32),
        X_sv_f64=X[support],
        dual_coef=np.asarray(svc.dual_coef_, np.float64),
        n_support=np.asarray(svc.n_support_, np.int64),
        intercept=np.asarray(svc.intercept_, np.float64),
        probA=np.asarray(svc.probA_, np.float64),
        probB=np.asarray(svc.probB_, np.float64),
        classes=np.asarray(svc.classes_, np.int64),
        label_map=label_map,
        thresholds=thresholds,
        window=np.int64(window),
        penalty=np.float64(penalty),
        gamma=np.float64(gamma),
        pwr_dist=np.int64(pwr_dist),
        block_size=np.int64(block_size),
        noise_class=np.bool_(noise_class),
        n_classes=np.int64(k),
    )


def convert_joblib(joblib_path: str | Path) -> dict[str, np.ndarray]:
    """Extract all arrays needed for inference from a reference joblib."""
    import joblib

    _install_unpickle_stubs()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        obj = joblib.load(joblib_path)
    d = obj.__dict__
    svc = d["model"]
    X = np.asarray(d["_X"], np.float64)
    support = np.asarray(svc.support_, np.int64)
    k = len(svc.classes_)
    label_mapper = d["label_mapper"]
    label_map = np.array([label_mapper[i] for i in range(k)], np.int32)
    thresholds = np.asarray(d["thresholds"], np.float64)
    if thresholds.shape == ():
        thresholds = np.full(k, float(thresholds))
    return dict(
        X_sv=X[support].astype(np.float32),
        X_sv_f64=X[support],
        dual_coef=np.asarray(svc.dual_coef_, np.float64),
        n_support=np.asarray(svc.n_support_, np.int64),
        intercept=np.asarray(svc.intercept_, np.float64),
        probA=np.asarray(svc.probA_, np.float64),
        probB=np.asarray(svc.probB_, np.float64),
        classes=np.asarray(svc.classes_, np.int64),
        label_map=label_map,
        thresholds=thresholds,
        window=np.int64(d["window"]),
        penalty=np.float64(d["penalty"]),
        gamma=np.float64(d.get("gamma", 1.0)),
        pwr_dist=np.int64(d.get("pwr_dist", 1)),
        block_size=np.int64(d.get("block_size", 500)),
        noise_class=np.bool_(d.get("noise_class", False)),
        n_classes=np.int64(k),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--src", default=None,
                    help="explicit joblib dir (e.g. a DEPRECATED/model_files)")
    ap.add_argument("--out", default=str(Path(__file__).parent / "model_files"))
    args = ap.parse_args(argv)
    src = (
        Path(args.src)
        if args.src
        else Path(args.reference) / "warpdemux" / "models" / "model_files"
    )
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for jl in sorted(src.glob("*.joblib")):
        arrays = convert_joblib(jl)
        dst = out / (jl.stem + ".npz")
        np.savez_compressed(dst, **arrays)
        print(
            f"{jl.stem}: n_sv={arrays['X_sv'].shape[0]} "
            f"k={int(arrays['n_classes'])} -> {dst}"
        )


if __name__ == "__main__":
    main()
