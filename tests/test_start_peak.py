"""Tests for the [rna_start_peak] detection method (tRNA primary;
detect/boundaries.py start_peak branch — reconstruction of the ADAPTed
contract from rna004_130bps@v1.0_tRNA.toml:66-81)."""

import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.config.utils import load_chemistry_config
from warpdemux_tpu.detect.boundaries import detect_boundaries_batch

from synth import synth_trna_read


def _trna_cfg():
    spc = load_chemistry_config("rna004_130bps@v1.0_tRNA")
    assert spc.primary_method == "start_peak"
    assert spc.detect.method == "start_peak"
    return spc.detect


def _batch(rng, B, L=10000, **kw):
    sigs = np.zeros((B, L), np.float32)
    lens = np.zeros(B, np.int32)
    truths = []
    for b in range(B):
        sig, truth = synth_trna_read(rng, **kw)
        n = min(L, sig.size)
        sigs[b, :n] = sig[:n]
        lens[b] = n
        truths.append(truth)
    return sigs, lens, truths


def test_spike_anchors_adapter_start():
    rng = np.random.default_rng(0)
    cfg = _trna_cfg()
    sigs, lens, truths = _batch(rng, 6, adapter_len=3200, polya_len=0)
    det = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray(lens), cfg
    )
    a_start = np.asarray(det.adapter_start)
    fail = np.asarray(det.fail_code)
    for b, t in enumerate(truths):
        assert fail[b] != 9, f"row {b}: spike not found"
        # adapter start = spike + offset1*ds = spike + 100 samples (+-ds
        # rounding of the pooled spike position)
        assert abs(int(a_start[b]) - (t["spike_idx"] + 100)) <= 60, (
            b,
            int(a_start[b]),
            t["spike_idx"],
        )


def test_no_spike_fails_with_code_9():
    rng = np.random.default_rng(1)
    cfg = _trna_cfg()
    sigs, lens, _ = _batch(rng, 4, spike_idx=None)
    det = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), cfg)
    assert (np.asarray(det.fail_code) == 9).all()


def test_polya_found_sets_adapter_end():
    rng = np.random.default_rng(2)
    cfg = _trna_cfg()
    sigs, lens, truths = _batch(
        rng, 5, adapter_len=3000, polya_len=600, trna_len=2500
    )
    det = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), cfg)
    a_end = np.asarray(det.adapter_end)
    ps = np.asarray(det.polya_start)
    for b, t in enumerate(truths):
        assert abs(int(a_end[b]) - t["polya_start"]) <= 150, (
            b,
            int(a_end[b]),
            t["polya_start"],
        )
        assert int(ps[b]) == int(a_end[b])


def test_fallback_to_llr_rescues_spikeless_reads():
    from dataclasses import replace
    from warpdemux_tpu.detect.boundaries import (
        detect_boundaries_with_fallback,
    )

    rng = np.random.default_rng(4)
    cfg = replace(
        _trna_cfg(),
        fallback_to_llr=True,
        # make the LLR path applicable to the synthetic reads (it requires a
        # polyA): all reads below have one
        mvs_detect_check=False,
        real_signal_check=False,
        detect_med_shift=False,
    )
    # rows WITHOUT a capture spike but WITH a polyA: start_peak fails (9),
    # the LLR fallback recovers them
    sigs, lens, truths = _batch(
        rng, 4, spike_idx=None, adapter_len=3000, polya_len=900,
    )
    primary = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray(lens), replace(cfg, fallback_to_llr=False)
    )
    assert (np.asarray(primary.fail_code) == 9).all()
    det = detect_boundaries_with_fallback(
        jnp.asarray(sigs), jnp.asarray(lens), cfg
    )
    assert np.asarray(det.success).all()
    a_end = np.asarray(det.adapter_end)
    for b, t in enumerate(truths):
        assert abs(int(a_end[b]) - t["adapter_end"]) <= 300


def test_trna_prep_step_end_to_end():
    """Full tRNA step (start_peak detect -> consensus-refined fingerprint)
    on synthetic reads: must produce 25-event fingerprints or a known fail
    taxonomy — never crash."""
    from warpdemux_tpu.config.utils import load_chemistry_config
    from warpdemux_tpu.pipeline.step import make_demux_step

    rng = np.random.default_rng(5)
    spc = load_chemistry_config("rna004_130bps@v1.0_tRNA")
    step = make_demux_step(None, spc, with_predict=False)
    sigs, lens, _ = _batch(rng, 8, adapter_len=3200, polya_len=500)
    import jax

    out = jax.device_get(step(sigs, lens)).unpack()
    assert out.consensus is not None
    fail = np.asarray(out.fail_code)
    assert set(np.unique(fail)) <= {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 13}
    fpt = np.asarray(out.fpt.fpt)
    assert fpt.shape == (8, 25)
    ok = np.asarray(out.success)
    assert np.isfinite(fpt[ok]).all()


def test_no_polya_uses_changepoint_for_adapter_end():
    rng = np.random.default_rng(3)
    cfg = _trna_cfg()
    sigs, lens, truths = _batch(
        rng, 5, adapter_len=3400, polya_len=0, trna_len=2500,
        adapter_level=66.0, adapter_spread=7.0, trna_level=95.0,
    )
    det = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), cfg)
    a_end = np.asarray(det.adapter_end)
    fail = np.asarray(det.fail_code)
    for b, t in enumerate(truths):
        # adapter->tRNA boundary via the two-segment split: the mean and
        # variance change at adapter_end; allow coarse tolerance
        assert fail[b] in (0, 7), (b, fail[b])
        assert abs(int(a_end[b]) - t["adapter_end"]) <= 400, (
            b,
            int(a_end[b]),
            t["adapter_end"],
        )
