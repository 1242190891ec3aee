"""Adversarial inputs for the tRNA (consensus-refined) lane
(VERDICT r3 next #9).

The tRNA throughput/accuracy numbers come from well-formed synthetic
reads; these tests drive the full tRNA step — start-peak detect,
consensus subsequence-DTW refinement, re-segmentation, DTW+SVM — over
(a) REAL mRNA-fixture adapters (wrong chemistry, but real nanopore
noise) and (b) pathological synthetics (truncated starts, missing
peaks, short adapters, flat/clipped signal), pinning that the gates
reject bad inputs with a clean taxonomy and that nothing produces
NaN or crashes. Reference contract for the outlier gates:
/root/reference/warpdemux/sig_proc.py:500-521.
"""

import os

import numpy as np
import pytest

ADC_SCALE, ADC_OFFSET = np.float32(0.1755), np.float32(-240.0)
MODEL = "WDX4_tRNA_rna004_v1_0"
FIXTURE = "/root/reference/test_data/live_balancing/small_pod5_0.pod5"


@pytest.fixture(scope="module")
def trna_step():
    from warpdemux_tpu.config.utils import get_model_spc_config
    from warpdemux_tpu.models.registry import load_model
    from warpdemux_tpu.pipeline.step import make_demux_step

    model = load_model(MODEL)
    spc = get_model_spc_config(MODEL)
    return make_demux_step(
        model, spc, input_format="pa", outputs="decision"
    )


def _run(step, sigs, lens):
    res = step(np.asarray(sigs, np.float32), np.asarray(lens, np.int32))
    return (
        np.asarray(res.pred),
        np.asarray(res.conf),
        np.asarray(res.success),
        np.asarray(res.fail_code),
        np.asarray(res.probs),
    )


@pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="real fixtures unavailable"
)
def test_trna_step_on_real_mrna_reads(trna_step):
    """Wrong-chemistry real reads: the consensus gates must reject
    cleanly (no NaN, no crash, bogus-pass rate bounded)."""
    from warpdemux_tpu.io.pod5 import yield_signal_batches

    sigs, lens = None, None
    for s, in_lens, _fl, _ids in yield_signal_batches(
        [FIXTURE], None, None, batch_size=200, preload_size=10000
    ):
        sigs, lens = s, in_lens
        break
    pred, conf, success, fail, probs = _run(trna_step, sigs, lens)

    assert np.isfinite(conf[success]).all()
    assert np.isfinite(probs[success]).all()
    assert np.isfinite(conf).all()  # masked lanes leak no NaN
    # about half the mRNA reads clear the structural gates (their adapters
    # do contain peak+consensus-like shapes), but the decisive invariant
    # is classification: NOT ONE wrong-chemistry read may receive a real
    # tRNA barcode — the trained noise class + thresholds must send every
    # survivor to -1 (measured 97/200 pass, all -1; pinned with slack)
    n_pass = int(success.sum())
    assert n_pass <= 0.6 * len(lens), f"tRNA gate pass rate {n_pass}/200"
    assert (pred[success] == -1).all(), (
        "wrong-chemistry reads classified as tRNA barcodes: "
        f"{pred[success][pred[success] != -1]}"
    )
    assert set(np.unique(fail[~success])) <= set(range(1, 15))


def _trna_base(rng):
    from warpdemux_tpu.utils.synthetic import (
        synth_trna_barcoded_read,
        trna_barcode_patterns,
    )

    pats = trna_barcode_patterns(n_barcodes=4, n_events=25)
    sig, _truth = synth_trna_barcoded_read(rng, pats[0])
    return np.asarray(sig, np.float32)


def test_trna_step_on_pathological_synthetics(trna_step):
    rng = np.random.default_rng(99)
    L = 10000
    base = _trna_base(rng)

    rows, names = [], []

    def add(name, sig):
        row = np.zeros(L, np.float32)
        n = min(len(sig), L)
        row[:n] = sig[:n]
        rows.append((row, n))
        names.append(name)

    add("well_formed", base)
    add("truncated_start", base[int(0.3 * len(base)):])
    # missing start peak: overwrite the leading region with flat adapter
    no_peak = base.copy()
    no_peak[:300] = 78.0 + rng.normal(0, 1.0, 300)
    add("missing_peak", no_peak)
    add("short_adapter", base[: 400])
    add("flat_signal", np.full(8000, 80.0, np.float32))
    add("pure_noise", rng.normal(80, 30, 9000).astype(np.float32))
    add("clipped_extremes", np.where(rng.random(9000) < 0.5, -500.0, 500.0).astype(np.float32))
    add("tiny", base[:64])

    sigs = np.stack([r for r, _ in rows])
    lens = np.asarray([n for _, n in rows], np.int32)
    pred, conf, success, fail, probs = _run(trna_step, sigs, lens)

    by = dict(zip(names, zip(success.tolist(), fail.tolist())))
    # the well-formed read sails through; every pathological variant that
    # fails does so with a coded reason (no crashes, no NaN anywhere)
    assert by["well_formed"][0] is True
    for name in ("flat_signal", "clipped_extremes", "tiny", "short_adapter"):
        ok, code = by[name]
        assert not ok, f"{name} should fail the gates"
        assert 1 <= code <= 14, (name, code)
    assert np.isfinite(conf[success]).all()
    assert np.isfinite(probs[success]).all()
    # masked lanes must not leak NaN into the packed outputs either
    assert np.isfinite(conf).all()
