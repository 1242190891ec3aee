"""Tests for the [cnn_boundaries] detection method (detect/cnn.py +
boundaries.py cnn branch): shipped synthetic-trained weights must locate
polyA boundaries on held-out synthetic reads, validate candidates, and
fall back to LLR when the CNN proposes nothing usable."""

import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from warpdemux_tpu.config.utils import load_chemistry_config
from warpdemux_tpu.detect import cnn
from warpdemux_tpu.detect.boundaries import (
    detect_boundaries_batch,
    detect_boundaries_with_fallback,
)

from synth import synth_batch

PARAMS = cnn.load_params("rna004_cnn_synth_v1")


def _cnn_cfg(**over):
    spc = load_chemistry_config(
        "rna004_130bps@v1.0", {"cnn_boundaries": {"cnn_detect": True}}
    )
    assert spc.primary_method == "cnn"
    cfg = spc.detect
    return replace(cfg, **over) if over else cfg


def test_cnn_boundaries_close_to_truth():
    rng = np.random.default_rng(11)
    cfg = _cnn_cfg()
    sigs, lens, truths = synth_batch(rng, 8)
    det = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray(lens), cfg, PARAMS
    )
    ok = np.asarray(det.success)
    ps = np.asarray(det.polya_start)
    pe = np.asarray(det.polya_end)
    n_ok = 0
    for b, t in enumerate(truths):
        if not ok[b]:
            continue
        assert abs(int(ps[b]) - t["polya_start"]) <= 150, (b, int(ps[b]), t)
        assert abs(int(pe[b]) - t["polya_end"]) <= 400, (b, int(pe[b]), t)
        n_ok += 1
    assert n_ok >= 6


def test_cnn_agrees_with_llr():
    rng = np.random.default_rng(12)
    cfg = _cnn_cfg()
    sigs, lens, _ = synth_batch(rng, 8)
    det_c = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray(lens), cfg, PARAMS
    )
    det_l = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray(lens), replace(cfg, method="llr")
    )
    both = np.asarray(det_c.success) & np.asarray(det_l.success)
    assert both.sum() >= 5
    dps = np.abs(
        np.asarray(det_c.polya_start) - np.asarray(det_l.polya_start)
    )[both]
    assert (dps <= 50).all(), dps


def test_cnn_requires_params():
    rng = np.random.default_rng(13)
    cfg = _cnn_cfg()
    sigs, lens, _ = synth_batch(rng, 2)
    try:
        detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), cfg)
    except ValueError as e:
        assert "cnn_params" in str(e)
    else:
        raise AssertionError("expected ValueError without cnn_params")


def test_cnn_fallback_rescues_weird_reads():
    # polyA-free mRNA-style reads: the CNN finds no valid candidate (fail 2)
    # but fallback_to_llr=false keeps the taxonomy; with fallback they pass
    # through the LLR path (which also fails 2 here -> stays failed), while
    # reads WITH polyA keep their CNN result. This exercises the selection.
    rng = np.random.default_rng(14)
    cfg = _cnn_cfg(fallback_to_llr=True)
    sigs, lens, truths = synth_batch(rng, 6)
    # kill the polyA of rows 0, 1 by overwriting with adapter-like noise
    for b in (0, 1):
        t = truths[b]
        s, e = t["polya_start"], t["polya_end"]
        sigs[b, s:e] = 75.0 + 12 * np.repeat(
            rng.normal(0, 1, (e - s) // 25 + 1), 25
        )[: e - s].astype(np.float32)
    det = detect_boundaries_with_fallback(
        jnp.asarray(sigs), jnp.asarray(lens), cfg, PARAMS
    )
    fail = np.asarray(det.fail_code)
    assert (fail[2:] == 0).all()
    assert (fail[:2] != 0).all()
