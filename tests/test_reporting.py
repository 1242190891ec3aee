"""Live reporting tests: per-read CSV, per-balancer stats time series,
balance tables, latency aggregation (reference reporting.py:23-575)."""

import csv

import numpy as np

from warpdemux_tpu.live.balancer import BalancerConfig, BarcodeBalancer
from warpdemux_tpu.live.reporting import LiveReporter, ProcessedCounters


def test_counters():
    c = ProcessedCounters(4)
    c.record("classified", True, 2)
    c.record("classified", False, 2)
    c.record("noise", True)
    c.record("unclassified", True)
    s = c.summary()
    assert s["accept"]["classified"] == 1
    assert s["reject"]["classified"] == 1
    assert s["accept"]["noise"] == 1
    assert s["bc_accept"][2] == 1 and s["bc_reject"][2] == 1


def test_reporter_csv_and_latency(tmp_path):
    r = LiveReporter(tmp_path, "t1", 4)
    r.report_read(
        5, "r1", "classified", 2, 0.9, True, "b0", 3000,
        {"segmentation": 0.01, "classification": 0.002, "total": 0.5},
    )
    r.report_read(6, "r2", "noise", None, 0.1, True, "b0", 2000)
    r.close()
    rows = list(csv.DictReader(open(tmp_path / "barcode_balancing_t1.csv")))
    assert len(rows) == 2
    assert rows[0]["decision"] == "accept"
    stats = r.latency_stats()
    assert "segmentation" in stats and stats["segmentation"][0] == 0.01


def test_balancer_stats_timeseries_and_table(tmp_path):
    r = LiveReporter(tmp_path, "t2", 4)
    b = BarcodeBalancer(
        4, BalancerConfig(balance_type="adapter_count"), name="b0"
    )
    b.record_classified("x", 1, accepted=True)
    b.record_classified("y", 1, accepted=True)
    r.report_balancer_stats([b])
    r.report_balancer_stats([b])
    rows = list(csv.DictReader(open(tmp_path / "balancer_stats_t2.csv")))
    assert len(rows) == 2
    assert float(rows[0]["bc1"]) == 2.0
    table = r.balance_table([b])
    assert "b0" in table and "adapter_count" in table
    r.close()
    b.stop()
