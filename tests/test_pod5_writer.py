"""pod5 writer round-trips + the live pod5-watcher integration it enables
(reference watcher strategies poll a sequencer output dir,
live_balancing/balancer.py:351-446)."""

import time

import numpy as np

from warpdemux_tpu.io.pod5 import Pod5Reader, yield_adc_batches
from warpdemux_tpu.io.pod5_writer import write_pod5


def _mk_reads(rng, n, sig_len=12000):
    reads = []
    for i in range(n):
        sig = np.cumsum(rng.integers(-30, 30, size=sig_len)).astype(np.int16)
        reads.append(
            dict(
                signal=sig,
                channel=i + 1,
                calibration_offset=-243.0,
                calibration_scale=0.1755,
                num_minknow_events=1500 + i,
            )
        )
    return reads


def test_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    reads = _mk_reads(rng, 5)
    p = tmp_path / "t.pod5"
    write_pod5(p, reads)
    with Pod5Reader(p) as r:
        assert len(r) == 5
        assert r.sample_rate == 4000.0
        for rec, rd in zip(r.reads(), reads):
            np.testing.assert_array_equal(rec.signal_adc(), rd["signal"])
            assert rec.channel == rd["channel"]
            assert rec.num_minknow_events == rd["num_minknow_events"]
            assert abs(rec.calibration_scale - 0.1755) < 1e-6


def test_writer_multirow_signal(tmp_path):
    rng = np.random.default_rng(1)
    # bounded ADC-range signal (a long random walk would overflow int16)
    sig = rng.integers(-2048, 2048, size=250000).astype(np.int16)
    p = tmp_path / "big.pod5"
    write_pod5(p, [dict(signal=sig)])
    with Pod5Reader(p) as r:
        rec = next(r.reads())
        assert rec.num_samples == 250000
        np.testing.assert_array_equal(rec.signal_adc(), sig)
        # head decode via the batch path (multi-row head -> re-based wire)
        batch = next(
            iter(
                yield_adc_batches(
                    [p], None, None, batch_size=1, preload_size=10000
                )
            )
        )
        adc = batch[0]
        np.testing.assert_array_equal(adc[0], sig[:10000])


def test_pod5_watcher_credits_accepted_reads(tmp_path):
    from warpdemux_tpu.live.balancer import BalancerConfig, BarcodeBalancer

    rng = np.random.default_rng(2)
    cfg = BalancerConfig(
        balance_type="read_count",
        pod5_watch_dir=str(tmp_path),
        pod5_check_interval=0.05,
    )
    b = BarcodeBalancer(4, cfg, name="w0")
    try:
        reads = _mk_reads(rng, 4, sig_len=3000)
        ids = []
        import uuid

        for rd in reads:
            rd["read_id"] = str(uuid.uuid4())
            ids.append(rd["read_id"])
        # two accepted reads of barcode 1, one of barcode 3; one unseen
        b.record_classified(ids[0], 1, accepted=True)
        b.record_classified(ids[1], 1, accepted=True)
        b.record_classified(ids[2], 3, accepted=True)
        write_pod5(tmp_path / "out.pod5", reads)
        deadline = time.time() + 5
        while time.time() < deadline and b.stats[1] < 2:
            time.sleep(0.05)
        assert b.stats[1] == 2.0, b.stats
        assert b.stats[3] == 1.0
        assert b.stats[0] == 0.0
    finally:
        b.stop()


def test_pod5_watcher_base_normalization_kbases(tmp_path):
    from warpdemux_tpu.live.balancer import BalancerConfig, BarcodeBalancer

    rng = np.random.default_rng(3)
    cfg = BalancerConfig(
        balance_type="base_normalization",
        pod5_watch_dir=str(tmp_path),
        pod5_check_interval=0.05,
    )
    b = BarcodeBalancer(4, cfg, name="w1")
    try:
        reads = _mk_reads(rng, 1, sig_len=2000)
        import uuid

        rid = str(uuid.uuid4())
        reads[0]["read_id"] = rid
        reads[0]["num_minknow_events"] = 2100
        b.record_classified(rid, 2, accepted=True)
        write_pod5(tmp_path / "o.pod5", reads)
        deadline = time.time() + 5
        while time.time() < deadline and b.stats[2] == 0:
            time.sleep(0.05)
        # kbases = (num_minknow_events - 100) / 1000 (balancer.py:125-136)
        assert abs(b.stats[2] - 2.0) < 1e-9, b.stats
    finally:
        b.stop()
