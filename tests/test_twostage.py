"""Two-stage adaptive preload: bit-identical decisions, thinner wire.

The decision lane may ship only the first stage1_len samples per read and
re-ship tails solely for reads whose decision provably needed them
(pipeline/step.py make_twostage_decision_step). These tests pin the whole
contract:

- the wire split/reassembly is exact (decoded ADC identical to the full
  wire, sample for sample),
- two-stage decisions are BIT-IDENTICAL to the one-stage 10k-preload path
  on the pinned synthetic bench population AND on the real fixture reads,
- stage 1 resolves enough of the population that the wire saving is real.

Reference contract being thinned: the fixed core.max_obs_trace preload of
file_proc.py:227-279 / README.md:489-497.
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

import bench
from warpdemux_tpu.config.utils import get_model_spc_config
from warpdemux_tpu.models.registry import load_model
from warpdemux_tpu.ops.vbz_device import (
    pack_tails_host,
    split_wire_host,
    vbz_decode_batch,
)
from warpdemux_tpu.pipeline.step import (
    make_demux_step,
    make_twostage_decision_step,
)

MODEL = "WDX4_rna004_v1_0"
L = 10000
L1 = 7168
FIXTURES = sorted(
    Path("/root/reference/test_data/live_balancing").glob("small_pod5_*.pod5")
)


def pack_ragged(adc, in_lens):
    """Pack per-read wire bodies for exactly in_len samples each (the pod5
    feed's packing invariant: key bits and data bytes zero past the read)."""
    from warpdemux_tpu.ops.vbz_device import inner_layout_from_adc

    B = adc.shape[0]
    keys = np.zeros((B, (L + 7) // 8), np.uint8)
    data = np.zeros((B, bench.VBZ_WIDTH), np.uint8)
    for i in range(B):
        n = int(in_lens[i])
        body = np.frombuffer(
            inner_layout_from_adc(adc[i, :n]), np.uint8
        )
        klen_i = (n + 7) // 8
        keys[i, :klen_i] = body[:klen_i]
        data[i, : body.size - klen_i] = body[klen_i:]
    return keys, data


def run_twostage(stage1, stage2, keys, data, offset, scale, in_lens):
    """Drive the two-stage host protocol for one batch; returns
    (DecisionStepOutput device handle, resolved bool array, wire_bytes)."""
    keys1, data1, off1 = split_wire_host(keys, data, in_lens, L1)
    h = stage1(keys1, data1, offset, scale, in_lens)
    resolved = np.asarray(h.resolved)
    wire = keys1.nbytes + data1.nbytes + offset.nbytes + scale.nbytes
    wire += np.asarray(in_lens).nbytes
    rows = np.where(~resolved)[0]
    if rows.size == 0:
        return h.out1, resolved, wire
    rows_p, keys_t, data_t = pack_tails_host(
        keys, data, in_lens, off1, rows, L1, L
    )
    wire += rows_p.nbytes + keys_t.nbytes + data_t.nbytes
    return stage2(h, rows_p, keys_t, data_t), resolved, wire


def assert_decisions_equal(got, want, where=None):
    for field in ("pred", "conf", "fail_code", "success", "probs"):
        a = np.asarray(getattr(got, field))
        b = np.asarray(getattr(want, field))
        if where is not None:
            a, b = a[where], b[where]
        np.testing.assert_array_equal(a, b, err_msg=field)


def test_wire_split_reassembly_exact():
    """decode(stage-1 wire) + tail continuation == decode(full wire)."""
    rng = np.random.default_rng(3)
    B = 64
    adc, _, _, in_lens = bench.synth_minibatch(rng, B, L)
    # vary lengths so whole-prefix, truncated and full rows all occur;
    # the wire invariant (keys/data zero past in_len, as the pod5 feed
    # packs them) must hold, so truncate the signal BEFORE encoding
    in_lens = in_lens.copy()
    in_lens[:16] = rng.integers(2500, L1, 16)
    keys, data = pack_ragged(adc, in_lens)
    full_adc = np.asarray(vbz_decode_batch(keys, data, L))

    keys1, data1, off1 = split_wire_host(keys, data, in_lens, L1)
    adc1 = np.asarray(vbz_decode_batch(keys1, data1, L1))
    np.testing.assert_array_equal(adc1, full_adc[:, :L1])

    rows = np.arange(B)
    rows_p, keys_t, data_t = pack_tails_host(
        keys, data, in_lens, off1, rows, L1, L
    )
    tail = np.asarray(vbz_decode_batch(keys_t, data_t, L - L1))
    got = tail[: len(rows)] + adc1[rows, -1:]
    np.testing.assert_array_equal(got, full_adc[rows, L1:])


@pytest.fixture(scope="module")
def steps():
    model = load_model(MODEL)
    spc = get_model_spc_config(MODEL)
    one = make_demux_step(model, spc, input_format="vbz", outputs="decision")
    stage1, stage2 = make_twostage_decision_step(model, spc, stage1_len=L1)
    return one, stage1, stage2


def test_twostage_decisions_bit_identical_synthetic(steps):
    """Pinned bench population: two-stage == one-stage, every output,
    every read; stage-1 resolution is high enough to matter."""
    one, stage1, stage2 = steps
    rng = np.random.default_rng(0)  # the bench's own seed
    B = 250
    n_res, n_tot, wire_tot = 0, 0, 0
    for _ in range(3):
        batch = bench.synth_minibatch_vbz(rng, B, L)
        want = one(*batch)
        got, resolved, wire = run_twostage(stage1, stage2, *batch)
        assert_decisions_equal(got, want)
        n_res += int(resolved.sum())
        n_tot += B
        wire_tot += wire
    # the saving must be real on the bench population (resolution floor
    # protects against a silently-degenerating predicate)
    assert n_res / n_tot >= 0.55, f"stage-1 resolved only {n_res}/{n_tot}"
    assert wire_tot / n_tot <= 10200, (
        f"effective wire {wire_tot / n_tot:.0f} B/read not below the "
        "~11.5 KB full-wire cost"
    )


def test_twostage_decisions_bit_identical_short_reads(steps):
    """Reads that end inside the stage-1 prefix are whole-shipped and must
    resolve unconditionally (identical program input)."""
    one, stage1, stage2 = steps
    rng = np.random.default_rng(11)
    B = 96
    adc, offset, scale, _ = bench.synth_minibatch(rng, B, L)
    in_lens = rng.integers(2200, L1 + 1, B).astype(np.int32)
    keys, data = pack_ragged(adc, in_lens)
    want = one(keys, data, offset, scale, in_lens)
    got, resolved, _ = run_twostage(
        stage1, stage2, keys, data, offset, scale, in_lens
    )
    assert resolved.all()
    assert_decisions_equal(got, want)


@pytest.mark.skipif(not FIXTURES, reason="reference pod5 fixtures absent")
def test_twostage_decisions_bit_identical_real_reads(steps):
    """All 800 real fixture reads: two-stage == one-stage bit-for-bit."""
    from warpdemux_tpu.io.pod5 import yield_vbz_batches

    one, stage1, stage2 = steps
    n_res = n_tot = 0
    for f in FIXTURES:
        for batch in yield_vbz_batches(
            [str(f)], None, None, batch_size=200, preload_size=L
        ):
            keys, data, offset, scale, in_lens = batch[:5]
            B = keys.shape[0]
            if B < 200:  # pad to the compiled batch shape
                pad = 200 - B
                keys = np.concatenate(
                    [keys, np.zeros((pad, keys.shape[1]), np.uint8)]
                )
                data = np.concatenate(
                    [data, np.zeros((pad, data.shape[1]), np.uint8)]
                )
                offset = np.concatenate([offset, np.zeros(pad, np.float32)])
                scale = np.concatenate([scale, np.zeros(pad, np.float32)])
                in_lens = np.concatenate([in_lens, np.zeros(pad, np.int32)])
            want = one(keys, data, offset, scale, in_lens)
            got, resolved, _ = run_twostage(
                stage1, stage2, keys, data, offset, scale, in_lens
            )
            assert_decisions_equal(got, want, where=np.arange(B))
            n_res += int(resolved[:B].sum())
            n_tot += B
    # Real-read resolution floor. This fixture population is heavy with
    # long adapters (median polya_end 7799; 252/800 fail 'adapter too
    # long', 146 'no polyA') — those decisions legitimately need the tail
    # to stay bit-identical, so resolution here is much lower than on the
    # bench population (0.75). Measured 0.19 at stage1_len=7168.
    assert n_res / n_tot >= 0.15, f"resolved {n_res}/{n_tot}"


@pytest.mark.skipif(not FIXTURES, reason="reference pod5 fixtures absent")
def test_cli_twostage_matches_onestage(tmp_path):
    """The production CLI path (predictions-only demux defaults to the
    two-stage wire) produces byte-identical predictions and fail taxonomy
    to a --stage1_preload 0 run."""
    import glob

    import pandas as pd

    from warpdemux_tpu.cli import main

    outs = {}
    for name, extra in (
        ("two", []),
        ("one", ["--stage1_preload", "0"]),
    ):
        out = tmp_path / name
        rc = main(
            [
                "demux", "-i", str(FIXTURES[0]), "-o", str(out),
                "-m", MODEL, "-b", "64", "--no-create_subdir", *extra,
            ]
        )
        assert rc in (0, None)
        preds = pd.concat(
            [
                pd.read_csv(f)
                for f in sorted(glob.glob(str(out / "predictions" / "*.csv.gz")))
            ],
            ignore_index=True,
        ).sort_values("#read_id").reset_index(drop=True)
        fails = pd.concat(
            [
                pd.read_csv(f)
                for f in sorted(glob.glob(str(out / "failed_reads" / "*.csv.gz")))
            ],
            ignore_index=True,
        ).sort_values("read_id").reset_index(drop=True)
        outs[name] = (preds, fails)
    pd.testing.assert_frame_equal(outs["two"][0], outs["one"][0])
    pd.testing.assert_frame_equal(outs["two"][1], outs["one"][1])
