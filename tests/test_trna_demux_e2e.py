"""tRNA demux end-to-end with the stand-in WDX4_tRNA model (VERDICT r1 #5).

The upstream tRNA joblibs are missing blobs, so the reference's own tRNA
predict path cannot run; this framework ships a stand-in DTW_SVM trained on
consensus-refined fingerprints of synthetic barcoded tRNA reads
(tools/train_trna_model.py). This test plants fresh barcoded tRNA reads
(seed disjoint from training) in a generated pod5 and requires the FULL
CLI path — start-peak detect, consensus subsequence-DTW refinement,
DTW+SVM classify — to recover the planted barcodes.
"""

import glob
import uuid

import numpy as np
import pandas as pd
import pytest

from warpdemux_tpu.io.pod5_writer import write_pod5
from warpdemux_tpu.utils.synthetic import (
    synth_trna_barcoded_read,
    trna_barcode_patterns,
)

ADC_SCALE, ADC_OFFSET = 0.1755, -240.0
BARCODES = [3, 4, 5, 7]


@pytest.fixture(scope="module")
def trna_pod5(tmp_path_factory):
    rng = np.random.default_rng(12345)  # disjoint from the trainer's seeds
    pats = trna_barcode_patterns(n_barcodes=4, n_events=25)
    reads, truth = [], {}
    for ci, bc in enumerate(BARCODES):
        for _ in range(10):
            sig_pa, _ = synth_trna_barcoded_read(rng, pats[ci])
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
    path = tmp_path_factory.mktemp("trna_fixture") / "trna.pod5"
    write_pod5(path, reads)
    return path, truth


def test_trna_demux_recovers_barcodes(trna_pod5, tmp_path):
    from warpdemux_tpu.cli import main

    path, truth = trna_pod5
    out = tmp_path / "demux"
    assert main(
        [
            "demux", "-i", str(path), "-o", str(out),
            "-m", "WDX4_tRNA_rna004_v1_0", "-b", "40", "--no-create_subdir",
        ]
    ) in (0, None)
    files = glob.glob(str(out / "predictions" / "*.csv.gz"))
    assert files, "tRNA demux produced no predictions"
    preds = pd.concat(
        [pd.read_csv(f) for f in files], ignore_index=True
    )
    # most planted reads must pass the tRNA gates and be classified
    assert len(preds) >= 0.8 * len(truth)
    want = preds["#read_id"].map(truth)
    acc = (preds["predicted_barcode"] == want).mean()
    assert acc >= 0.9, f"tRNA barcode recovery {acc:.2f}"
    # probability columns follow the reference contract (p03..p07 + p-1)
    assert {"p03", "p04", "p05", "p07", "p-1"} <= set(preds.columns)
