"""Self-contained demux ACCURACY end-to-end: a synthetic barcoded pod5
(generated with our own writer from WDX4 support-vector fingerprints) runs
through the full CLI and the assignments must recover the planted
barcodes. This is the framework's stand-in for the reference's
4000_rna004.pod5 smoke test (a missing blob upstream; SURVEY 4.1)."""

import glob
import uuid

import numpy as np
import pandas as pd
import pytest

from warpdemux_tpu.io.pod5_writer import write_pod5
from warpdemux_tpu.live.dummy import synth_barcoded_read
from warpdemux_tpu.models.registry import load_model

ADC_SCALE, ADC_OFFSET = 0.1755, -240.0


@pytest.fixture(scope="module")
def barcoded_pod5(tmp_path_factory):
    rng = np.random.default_rng(0)
    model = load_model("WDX4_rna004_v1_0")
    X = np.asarray(model.X_sv)
    label_map = np.asarray(model.label_map)
    # per-class support-vector ranges (n_support concatenation order)
    n_sup = np.asarray(np.load(
        "warpdemux_tpu/models/model_files/WDX4_rna004_v1_0.npz"
    )["n_support"])
    bounds = np.concatenate([[0], np.cumsum(n_sup)])
    reads, truth = [], {}
    n_per = 12
    for ci, bc in enumerate(label_map[:-1]):  # skip the noise class
        lo, hi = bounds[ci], bounds[ci + 1]
        for _ in range(n_per):
            sv = X[rng.integers(lo, hi)]
            sig_pa = synth_barcoded_read(rng, sv)
            adc = np.clip(
                np.rint(sig_pa / ADC_SCALE - ADC_OFFSET), -32768, 32767
            ).astype(np.int16)
            rid = str(uuid.uuid4())
            truth[rid] = int(bc)
            reads.append(
                dict(
                    read_id=rid,
                    signal=adc,
                    calibration_offset=ADC_OFFSET,
                    calibration_scale=ADC_SCALE,
                )
            )
    path = tmp_path_factory.mktemp("fixture") / "barcoded.pod5"
    write_pod5(path, reads)
    return path, truth


def test_demux_recovers_planted_barcodes(barcoded_pod5, tmp_path):
    from warpdemux_tpu.cli import main

    path, truth = barcoded_pod5
    out = tmp_path / "demux"
    assert main(
        [
            "demux", "-i", str(path), "-o", str(out),
            "-m", "WDX4_rna004_v1_0", "-b", "48", "--no-create_subdir",
        ]
    ) in (0, None)
    preds = pd.concat(
        [pd.read_csv(f) for f in glob.glob(str(out / "predictions" / "*.csv.gz"))],
        ignore_index=True,
    )
    assert len(preds) >= 0.8 * len(truth), (len(preds), len(truth))
    correct = sum(
        int(row.predicted_barcode) == truth[row["#read_id"]]
        for _, row in preds.iterrows()
        if row.predicted_barcode != -1
    )
    called = int((preds.predicted_barcode != -1).sum())
    assert called >= 0.6 * len(preds), (called, len(preds))
    acc = correct / max(called, 1)
    assert acc >= 0.95, f"accuracy {acc:.3f} ({correct}/{called})"
