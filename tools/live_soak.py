"""Live-lane soak harness (VERDICT r3 next #7).

Runs the dummy live session for many reads (optionally paced at the
MinKNOW chunk cadence) while a sampler thread records the size of every
structure that could grow with run length — the latency reservoirs, the
CRUD escalation map, the fingerprint queue, process RSS — plus decision
progress. Prints ONE JSON report asserting-friendly numbers:

    python tools/live_soak.py --reads 12000 [--chunk-period 0.1]
        [--duration-min 10] [--out report.json]

The reference's analog is its overnight balancing runs with periodic
report_worker output (live_balancing/reporting.py:112-575); this makes
the hours-scale memory story a measurable artifact instead of a claim.
"""

import argparse
import json
import resource
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=12000)
    ap.add_argument("--chunk-period", type=float, default=0.0)
    ap.add_argument(
        "--duration-min",
        type=float,
        default=0.0,
        help="if > 0, keep replaying fresh reads until this many minutes "
        "have elapsed (reads count becomes a lower bound)",
    )
    ap.add_argument("--channels", type=int, default=126)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from warpdemux_tpu.live.balancer import BalancerConfig, BarcodeBalancers
    from warpdemux_tpu.live.dummy import DummyClient, synth_barcoded_read
    from warpdemux_tpu.live.session import Session, SessionConfig
    from warpdemux_tpu.models.registry import load_model

    model = load_model("WDX4_rna004_v1_0")
    rng = np.random.default_rng(args.seed)
    X_sv = np.asarray(model.X_sv)
    signals = [synth_barcoded_read(rng, X_sv[i]) for i in range(0, 800, 16)]

    n_reads = args.reads
    client = DummyClient(
        n_reads=n_reads,
        chunk_size=1500,
        n_channels=args.channels,
        seed=args.seed,
        signals=signals,
        chunk_period_s=args.chunk_period,
        stagger_s=args.chunk_period * 10 if args.chunk_period else 0.0,
    )
    save_dir = tempfile.mkdtemp(prefix="wdx_soak_")
    cfg = SessionConfig(
        model_name="WDX4_rna004_v1_0",
        save_path=save_dir,
        run_id="soak",
        check_real_range=False,
        max_batch=32,
    )
    balancers = BarcodeBalancers.from_configs(
        model.n_classes - 1,
        [BalancerConfig(balance_type="adapter_count")],
        [1.0],
        n_channels=args.channels,
    )
    session = Session(client, cfg, balancers, model=model)

    samples: list[dict] = []
    stop = threading.Event()
    progress = {"base": 0}

    def sampler():
        while not stop.is_set():
            with session.reporter._lock:
                lat_n = sum(len(v) for v in session.reporter._lat.values())
            samples.append(
                dict(
                    t=time.time(),
                    decided=progress["base"]
                    + len(client.stopped)
                    + len(client.unblocked),
                    lat_samples=lat_n,
                    crud_channels=len(session.crud._last),
                    fpt_queue=session.fpt_queue.qsize(),
                    rss_mb=resource.getrusage(
                        resource.RUSAGE_SELF
                    ).ru_maxrss
                    / 1024.0,
                )
            )
            stop.wait(1.0)

    th = threading.Thread(target=sampler, daemon=True)
    t0 = time.time()
    th.start()
    deadline = t0 + args.duration_min * 60 if args.duration_min else None
    total_reads = 0
    while True:
        session.run(batch_size=args.batch, warmup=(total_reads == 0))
        total_reads += n_reads
        if deadline is None or time.time() >= deadline:
            break
        # classifier threads are one-shot: replay another client through a
        # fresh Session, carrying the reporter/CRUD/skip-stats forward so
        # the memory story spans the whole soak
        client = DummyClient(
            n_reads=n_reads,
            chunk_size=1500,
            n_channels=args.channels,
            seed=args.seed + total_reads,
            signals=signals,
            chunk_period_s=args.chunk_period,
            stagger_s=args.chunk_period * 10 if args.chunk_period else 0.0,
        )
        progress["base"] = total_reads
        prev = session
        session = Session(
            client, cfg, balancers, model=model, reporter=prev.reporter
        )
        session.crud = prev.crud
        session.skip_stats = prev.skip_stats
    elapsed = time.time() - t0
    stop.set()
    th.join(timeout=3)
    # one final synchronous sample: the shutdown drain decides the last
    # few reads after the sampler's last 1 s tick
    with session.reporter._lock:
        lat_n = sum(len(v) for v in session.reporter._lat.values())
    samples.append(
        dict(
            t=time.time(),
            decided=progress["base"]
            + len(client.stopped)
            + len(client.unblocked),
            lat_samples=lat_n,
            crud_channels=len(session.crud._last),
            fpt_queue=session.fpt_queue.qsize(),
            rss_mb=resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            / 1024.0,
        )
    )

    # final-report completeness
    import csv as _csv

    csv_rows = 0
    with open(Path(save_dir) / "barcode_balancing_soak.csv") as fh:
        csv_rows = sum(1 for _ in _csv.reader(fh)) - 1
    pct = session.reporter.latency_percentiles()
    table = session.reporter.balance_table(balancers.balancers)
    stats_files = sorted(
        str(p.name) for p in Path(save_dir).glob("balancer_stats_*.csv")
    )

    # memory flatness: compare the sample nearest 1/3 of decisions with the
    # last sample (warm-up compile growth is over well before 1/3)
    decided_total = samples[-1]["decided"] if samples else 0
    third = next(
        (s for s in samples if s["decided"] >= decided_total / 3),
        samples[0] if samples else None,
    )
    report = dict(
        reads=total_reads,
        elapsed_s=round(elapsed, 1),
        reads_per_s=round(total_reads / elapsed, 1),
        decided=decided_total,
        csv_rows=csv_rows,
        skip_stats=dict(session.skip_stats),
        latency_stages=sorted(pct),
        latency_p99_ms={
            k: round(v["p99"] * 1e3, 2) for k, v in pct.items()
        },
        latency_reservoir_cap=session.reporter.LAT_RESERVOIR,
        balance_table_lines=len(table.splitlines()),
        balancer_stats_files=stats_files,
        rss_mb_third=third["rss_mb"] if third else None,
        rss_mb_final=samples[-1]["rss_mb"] if samples else None,
        lat_samples_third=third["lat_samples"] if third else None,
        lat_samples_final=samples[-1]["lat_samples"] if samples else None,
        crud_channels_final=samples[-1]["crud_channels"] if samples else None,
        fpt_queue_max=max((s["fpt_queue"] for s in samples), default=0),
        save_dir=save_dir,
    )
    line = json.dumps(report)
    print(line)
    if args.out:
        Path(args.out).write_text(line)


if __name__ == "__main__":
    main()
