"""Device throughput sweep across model sizes (VERDICT r3 next #2).

Every prior perf number was WDX4 (851 reference fingerprints). WDX6 is
1368 and WDX10 is 2601 refs with an 11-class Wu-Lin coupling — ~3x the
DTW lattice work — and the reference grew a block-parallel mode
precisely because large models are heavy
(/root/reference/warpdemux/parallel_distances.py:139-198). This sweep
measures full-output and decision-lane reads/s per model with
device-resident inputs (the compute bound a PCIe-attached host would
see), exactly like bench.py's compute_only/decision_lane numbers.

Usage: python tools/bench_models.py [WDX4_rna004_v1_0 WDX6_rna004_v1_0 ...]
"""

import json
import queue
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from warpdemux_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from bench import B, L, synth_minibatch
from warpdemux_tpu.config.utils import get_model_spc_config
from warpdemux_tpu.models.registry import load_model
from warpdemux_tpu.pipeline.step import make_demux_step

BASELINE_READS_PER_S = 700.0
N_BATCHES = 16  # matches bench.py compute_only (ramp/drain weigh ~25% at 12)


def measure(step_fn, resident):
    """Fetch-closed pipelined loop (4 fetch threads), reads/s."""
    res = step_fn(*resident[0])
    jax.device_get((res.pred, res.conf, res.success))  # warm/compile
    fetchq: queue.Queue = queue.Queue()

    def fetcher():
        while True:
            r = fetchq.get()
            if r is None:
                return
            jax.device_get((r.pred, r.conf, r.success))

    fetchers = [threading.Thread(target=fetcher) for _ in range(4)]
    t0 = time.time()
    for th in fetchers:
        th.start()
    for b in resident:
        fetchq.put(step_fn(*b))
    for _ in fetchers:
        fetchq.put(None)
    for th in fetchers:
        th.join()
    return len(resident) * B / (time.time() - t0)


def main():
    models = sys.argv[1:] or [
        "WDX4_rna004_v1_0",
        "WDX6_rna004_v1_0",
        "WDX10_rna004_v1_0",
    ]
    rng = np.random.default_rng(0)
    resident = [
        tuple(jax.device_put(a) for a in synth_minibatch(rng, B, L))
        for _ in range(N_BATCHES)
    ]
    jax.block_until_ready(resident)

    print(
        f"# backend={jax.default_backend()} B={B} batches={N_BATCHES} "
        f"(device-resident adc feed)",
        file=sys.stderr,
    )
    for name in models:
        model = load_model(name)
        spc = get_model_spc_config(name)
        n_ref = int(np.asarray(model.X_sv).shape[0])
        k = int(model.n_classes)
        full = measure(
            make_demux_step(model, spc, input_format="adc"), resident
        )
        dec = measure(
            make_demux_step(
                model, spc, input_format="adc", outputs="decision"
            ),
            resident,
        )
        print(
            json.dumps(
                dict(
                    model=name,
                    n_ref=n_ref,
                    n_classes=k,
                    full_reads_per_s=round(full, 0),
                    full_vs_baseline=round(full / BASELINE_READS_PER_S, 1),
                    decision_reads_per_s=round(dec, 0),
                    decision_vs_baseline=round(
                        dec / BASELINE_READS_PER_S, 1
                    ),
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
