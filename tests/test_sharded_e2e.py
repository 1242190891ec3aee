"""Mesh-sharded demux through the real pipeline + CLI (VERDICT r1 item 2).

Runs the same pod5 fixture through `demux` single-device and sharded over
the 8-device virtual CPU mesh (--devices 0) and requires byte-identical
prediction and failed-reads outputs — the multi-chip runtime is the
production pipeline, not a side path. Mirrors the reference's only scaling
axis (reads-parallel process pool, file_proc.py:1197-1245)."""

import glob
import gzip
from pathlib import Path

import pandas as pd
import pytest

POD5 = "/root/reference/test_data/live_balancing/small_pod5_0.pod5"
pytestmark = pytest.mark.skipif(
    not Path(POD5).exists(), reason="pod5 fixture unavailable"
)


def _cli(*argv):
    from warpdemux_tpu.cli import main

    assert main(list(argv)) in (0, None)


def _cat(pattern):
    frames = [pd.read_csv(f) for f in sorted(glob.glob(pattern))]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_sharded_demux_matches_single_device(tmp_path):
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    out1 = tmp_path / "single"
    out8 = tmp_path / "sharded"
    common = ["-m", "WDX4_rna004_v1_0", "-b", "64", "--no-create_subdir"]
    _cli("demux", "-i", POD5, "-o", str(out1), *common)
    _cli("demux", "-i", POD5, "-o", str(out8), *common, "--devices", "0")

    for sub in ("predictions", "failed_reads"):
        a = _cat(str(out1 / sub / "*.csv.gz"))
        b = _cat(str(out8 / sub / "*.csv.gz"))
        assert len(a) == len(b), sub
        a = a.sort_values(a.columns[0]).reset_index(drop=True)
        b = b.sort_values(b.columns[0]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_sharded_minibatch_rounding(tmp_path):
    # B=50 is not a multiple of 8 devices; the pipeline must round it up
    # and still produce complete outputs
    out = tmp_path / "round"
    _cli(
        "demux", "-i", POD5, "-o", str(out),
        "-m", "WDX4_rna004_v1_0", "-b", "50", "--no-create_subdir",
        "--devices", "0",
    )
    preds = _cat(str(out / "predictions" / "*.csv.gz"))
    fails = _cat(str(out / "failed_reads" / "*.csv.gz"))
    assert len(preds) + len(fails) == 200
