"""End-to-end pipeline tests on a real pod5 fixture: demux / prep /
predict / continue through the CLI surface (the reference's smoke-test
strategy, SURVEY 4.1, turned into pytest)."""

import glob
import gzip
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

POD5 = "/root/reference/test_data/live_balancing/small_pod5_0.pod5"
pytestmark = pytest.mark.skipif(
    not Path(POD5).exists(), reason="pod5 fixture unavailable"
)

COMMON = ["-m", "WDX4_rna004_v1_0", "-b", "64", "--no-create_subdir"]


def _cli(*argv):
    from warpdemux_tpu.cli import main

    assert main(list(argv)) in (0, None)


def _read_csvs(pattern):
    frames = [pd.read_csv(f) for f in sorted(glob.glob(pattern))]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_demux_end_to_end(tmp_path):
    out = tmp_path / "demux"
    _cli("demux", "-i", POD5, "-o", str(out), *COMMON)
    preds = _read_csvs(str(out / "predictions" / "*.csv.gz"))
    fails = _read_csvs(str(out / "failed_reads" / "*.csv.gz"))
    assert len(preds) + len(fails) == 200
    # real-fixture pass rate pinned (VERDICT r1 #4; measured 2026-08-19:
    # 99 of 200 reads pass detect+fingerprint with cnn+llr-fallback —
    # exact counts pinned in tests/test_real_boundaries.py)
    assert 90 <= len(preds) <= 110
    assert set(preds.columns) >= {
        "#read_id", "predicted_barcode", "confidence_score",
        "p03", "p04", "p05", "p07", "p-1",
    }
    assert preds["predicted_barcode"].isin([3, 4, 5, 7, -1]).all()
    # probabilities are a distribution
    psum = preds[["p03", "p04", "p05", "p07", "p-1"]].sum(axis=1)
    assert ((psum - 1.0).abs() < 0.01).all()
    assert "fail_reason" in fails.columns
    assert (out / "command.json").exists()


def test_prep_then_predict_matches_demux(tmp_path):
    out_d = tmp_path / "demux"
    out_p = tmp_path / "prep"
    _cli("demux", "-i", POD5, "-o", str(out_d), *COMMON)
    _cli("prep", "-i", POD5, "-o", str(out_p), *COMMON)
    fpts = sorted(glob.glob(str(out_p / "fingerprints" / "*.npz")))
    assert fpts
    with np.load(fpts[0], allow_pickle=True) as z:
        assert z["signals"].shape[1] == 25
    _cli("predict", str(out_p))
    preds_d = _read_csvs(str(out_d / "predictions" / "*.csv.gz"))
    preds_p = _read_csvs(str(out_p / "predictions" / "*.csv.gz"))
    m = preds_d.merge(preds_p, on="#read_id", suffixes=("_d", "_p"))
    assert len(m) == len(preds_d) == len(preds_p)
    assert (m["predicted_barcode_d"] == m["predicted_barcode_p"]).all()


def test_trna_prep_cli_end_to_end(tmp_path):
    """prep with the tRNA chemistry (start-peak detect + consensus
    refinement) on real mRNA reads: must produce the extended boundary
    columns and a sane fail taxonomy (mRNA reads mostly fail the tRNA
    gates), never crash."""
    out = tmp_path / "trna"
    _cli(
        "prep", "-i", POD5, "-o", str(out),
        "-m", "WDX4_tRNA_rna004_v1_0", "-b", "64", "--no-create_subdir",
        "--save_boundaries",
    )
    fails = _read_csvs(str(out / "failed_reads" / "*.csv.gz"))
    bounds = _read_csvs(str(out / "boundaries" / "*.csv.gz"))
    assert len(fails) + len(bounds) == 200
    for df in (fails, bounds):
        if len(df):
            assert {"seg_cons_query_start", "seg_cons_query_end",
                    "sig_barcode_start"} <= set(df.columns)
    allowed = {
        "", "signal too short", "no polyA found", "adapter too short",
        "adapter too long", "mvs polya check failed",
        "real signal check failed", "med shift check failed",
        "open pore signal", "rna start peak not found",
        "event segmentation failed", "consensus query outlier",
    }
    got = set(fails["fail_reason"].fillna(""))
    assert got <= allowed, got - allowed


def test_wdx10_demux_end_to_end(tmp_path):
    """The largest shipped model (WDX10: 2601 support vectors, 10 barcodes
    + noise) through the full CLI: probability columns for all 11 classes."""
    out = tmp_path / "w10"
    _cli("demux", "-i", POD5, "-o", str(out), "-m", "WDX10_rna004_v1_0",
         "-b", "64", "--no-create_subdir")
    preds = _read_csvs(str(out / "predictions" / "*.csv.gz"))
    assert len(preds) > 50
    import re

    pcols = [c for c in preds.columns if re.fullmatch(r"p-?\d+", c)]
    assert len(pcols) == 11
    psum = preds[pcols].sum(axis=1)
    assert ((psum - 1.0).abs() < 0.01).all()
    assert preds["predicted_barcode"].isin(
        [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, -1]
    ).all()


def test_continue_resumes_without_reprocessing(tmp_path):
    out = tmp_path / "demux"
    _cli("demux", "-i", POD5, "-o", str(out), *COMMON)
    n_before = len(_read_csvs(str(out / "predictions" / "*.csv.gz")))
    _cli("continue", str(out))
    preds = _read_csvs(str(out / "predictions" / "*.csv.gz"))
    # all reads were already processed: no duplicates appear
    assert len(preds) == n_before
    assert preds["#read_id"].is_unique


def test_adc_wire_matches_vbz_wire(tmp_path):
    """--wire adc (raw int16 counts, zero device decode) must produce
    byte-identical outputs to the default compressed VBZ wire."""
    out_v = tmp_path / "vbz"
    out_a = tmp_path / "adc"
    _cli("demux", "-i", POD5, "-o", str(out_v), *COMMON)
    _cli("demux", "-i", POD5, "-o", str(out_a), *COMMON, "--wire", "adc")
    for sub in ("predictions", "failed_reads"):
        a = _read_csvs(str(out_v / sub / "*.csv.gz"))
        b = _read_csvs(str(out_a / sub / "*.csv.gz"))
        a = a.sort_values(a.columns[0]).reset_index(drop=True)
        b = b.sort_values(b.columns[0]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_predictions_only_run_uses_decision_lane(tmp_path, monkeypatch):
    """VERDICT r2 #2 (+ r5 two-stage): a predictions-only demux run must
    take the decision lane — now the TWO-STAGE wire feed (stage-1 prefix +
    tails only where provably needed; pipeline/step.py) — while boundary-
    or fingerprint-requesting runs keep the full step. Asserted via the
    step constructors actually invoked and the step-output type."""
    import warpdemux_tpu.pipeline.run as run_mod
    import warpdemux_tpu.pipeline.step as step_mod
    from warpdemux_tpu.pipeline.step import (
        PackedStepOutput,
        make_demux_step,
        make_twostage_decision_step,
    )

    seen = {}
    real_two = make_twostage_decision_step

    def spy_two(*args, **kwargs):
        seen["two_stage"] = True
        return real_two(*args, **kwargs)

    monkeypatch.setattr(
        step_mod, "make_twostage_decision_step", spy_two
    )

    real = make_demux_step

    def spy(*args, **kwargs):
        seen["outputs"] = kwargs.get("outputs", "full")
        step = real(*args, **kwargs)

        def wrapped(*a):
            res = step(*a)
            seen["type"] = type(res)
            return res

        return wrapped

    monkeypatch.setattr(run_mod, "make_demux_step", spy)

    out = tmp_path / "decision"
    _cli("demux", "-i", POD5, "-o", str(out), *COMMON)
    assert seen.pop("two_stage", False), "decision run skipped two-stage"
    assert "outputs" not in seen  # the full-step constructor never ran
    preds = _read_csvs(str(out / "predictions" / "*.csv.gz"))
    fails = _read_csvs(str(out / "failed_reads" / "*.csv.gz"))
    assert len(preds) + len(fails) == 200
    assert list(fails.columns) == ["read_id", "fail_reason"]

    out2 = tmp_path / "full"
    _cli("demux", "-i", POD5, "-o", str(out2), "--save_boundaries", *COMMON)
    assert seen["outputs"] == "full"
    assert seen["type"] is PackedStepOutput
    assert "two_stage" not in seen
    # per-method result columns (VERDICT r2 #6, reference README.md:443-446):
    # cnn is the configured primary for RNA004 mRNA, llr the fallback
    bounds = _read_csvs(str(out2 / "boundaries" / "*.csv.gz"))
    fails2 = _read_csvs(str(out2 / "failed_reads" / "*.csv.gz"))
    for df in (bounds, fails2):
        for col in (
            "cnn_polya_start", "cnn_fail_reason", "llr_polya_start",
            "llr_fail_reason", "mvs_med_shift", "mvs_min_polya_var",
        ):
            assert col in df.columns, col
    assert "fail_reason" not in bounds.columns
    # decision lane and full lane agree on every call
    p2 = _read_csvs(str(out2 / "predictions" / "*.csv.gz"))
    m = preds.merge(p2, on="#read_id", suffixes=("_d", "_f"))
    assert len(m) == len(preds) == len(p2)
    assert (m["predicted_barcode_d"] == m["predicted_barcode_f"]).all()


def test_predict_accounts_for_every_read(tmp_path):
    """VERDICT r2 #8: predict mode routes non-finite fingerprints to
    failed_reads instead of silently dropping them —
    predictions + failures == inputs."""
    out_p = tmp_path / "prep"
    _cli("prep", "-i", POD5, "-o", str(out_p), *COMMON)
    fpts = sorted(glob.glob(str(out_p / "fingerprints" / "*.npz")))
    assert fpts
    with np.load(fpts[0], allow_pickle=True) as z:
        arrays = {k: z[k] for k in z.files}
    n_in = len(arrays["read_ids"])
    arrays["signals"] = arrays["signals"].copy()
    arrays["signals"][0, :] = np.nan  # poison one fingerprint
    np.savez(fpts[0], **arrays)
    n_fail_prep = len(
        _read_csvs(str(out_p / "failed_reads" / "*.csv.gz"))
    )
    _cli("predict", str(out_p))
    preds = _read_csvs(str(out_p / "predictions" / "*.csv.gz"))
    fails = _read_csvs(str(out_p / "failed_reads" / "*.csv.gz"))
    assert len(preds) == n_in - 1
    assert len(fails) == n_fail_prep + 1
    poisoned = fails[fails["fail_reason"] == "non-finite fingerprint"]
    assert len(poisoned) == 1
    assert poisoned["read_id"].iloc[0] == str(arrays["read_ids"][0])
    assert len(preds) + 1 == n_in
