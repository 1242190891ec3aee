"""Live-lane soak (VERDICT r3 next #7): >=10k reads through the dummy
session in one process, asserting flat memory (latency reservoirs, CRUD
map, fingerprint queue, RSS) and end-of-run report completeness.

Runs tools/live_soak.py as a subprocess so RSS reflects the live lane
alone, not the rest of the test session. The latency-budget story on
real hardware lives in STATUS.md (tools/live_latency.py); this test pins
the structural guarantees that hold on any backend.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_live_soak_memory_flat_and_reports_complete():
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "live_soak.py"),
            "--reads",
            "12000",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])

    # every read reached a decision and a CSV row
    assert rep["reads"] == 12000
    assert rep["decided"] == 12000
    assert rep["csv_rows"] == 12000

    # report completeness: per-stage latency percentiles, balancer stats
    # time series, skip stats with every reference-parity counter
    assert {"segmentation", "classification", "total"} <= set(
        rep["latency_stages"]
    )
    assert rep["balancer_stats_files"]
    for key in (
        "missed_reads",
        "too_long_reads",
        "not_real_read",
        "no_polya_yet",
        "missed_obs_n",
    ):
        assert key in rep["skip_stats"]

    # memory flatness: every run-length-scaling structure is bounded
    assert rep["lat_samples_final"] <= rep["latency_reservoir_cap"] * len(
        rep["latency_stages"]
    )
    assert rep["crud_channels_final"] <= 126
    # RSS past the 1/3 point (compiles done) must be near-flat: < 15%
    # growth while the second 2/3 of the reads stream through
    growth = rep["rss_mb_final"] / rep["rss_mb_third"] - 1.0
    assert growth < 0.15, (rep["rss_mb_third"], rep["rss_mb_final"])


@pytest.mark.skipif(
    not __import__("os").environ.get("WDX_TPU_TESTS"),
    reason="device test: set WDX_TPU_TESTS=1 to pin the live decision "
    "budget on real hardware (the shared tunnel's dispatch round trips "
    "make it environment-bound otherwise; see STATUS.md)",
)
def test_live_decision_budget_on_device():
    """p99 decision latency within one 100 ms MinKNOW chunk period at a
    channel count sized to the transport.

    The budget is a statement about the LANE, not the link: the r5
    decomposition (STATUS) measured ~0.25 ms of device compute per
    16-read micro-batch against a ~30 ms dispatch round trip on this
    WAN-tunneled chip — 3-4 round trips per decision make the budget
    un-meetable on ANY lane through such a transport. Probe the bare
    dispatch+fetch RT first and skip (with the measurement) when the
    transport alone exceeds the budget's order; locally-attached devices
    (sub-ms RT) run the full assertion."""
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import time, numpy as np, jax;"
                "f = jax.jit(lambda x: x + 1);"
                "x = jax.device_put(np.zeros(8, np.float32));"
                "np.asarray(f(x));"
                "ts = [];\n"
                "for _ in range(10):\n"
                "    t0 = time.time(); np.asarray(f(x));"
                " ts.append(time.time() - t0)\n"
                "print(f'RT_MS={np.median(ts) * 1e3:.2f}')"
            ),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert probe.returncode == 0, probe.stdout + probe.stderr
    rt_ms = float(probe.stdout.split("RT_MS=")[1].split()[0])
    if rt_ms > 5.0:
        pytest.skip(
            f"dispatch round trip {rt_ms:.1f} ms: the transport alone "
            "exceeds the 100 ms budget's order (3-4 RTs per decision "
            "batch); see STATUS r5 for the measured decomposition and "
            "the locally-attached arithmetic"
        )
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "live_latency.py"),
            "--reads",
            "120",
            "--channels",
            "24",
            "--assert-budget",
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
