"""tRNA-path device throughput (WarpDemuX-tRNA capability benchmark).

The reference's tRNA headline is 38 s / 100k reads on 16 cores
(~2,630 reads/s; README.md:376, BASELINE.md). This measures the full tRNA
step — start-peak detect, consensus-refined segmentation (psi-relaxed
subsequence DTW of the 82-event consensus against the segmented adapter),
re-segmentation, DTW + SVM — on the default backend with device-resident
inputs, the same protocol as bench.py's compute_only.

With --real, the same step is instead fed the 800 real RNA004 mRNA
fixture reads (wrong chemistry, real pore noise): the throughput then
reflects the consensus-outlier gates churning on adversarial signal, and
the pass count shows how many wrong-chemistry reads clear the structural
gates (their barcode calls are pinned to the noise class by
tests/test_trna_adversarial.py).

Usage: python tools/bench_trna.py [B] [--real]
"""

import queue
import sys
import threading
import time
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, ".")

from warpdemux_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from warpdemux_tpu.config.utils import get_model_spc_config
from warpdemux_tpu.models.registry import load_model
from warpdemux_tpu.pipeline.step import make_demux_step
from warpdemux_tpu.utils.synthetic import (
    synth_trna_barcoded_read,
    trna_barcode_patterns,
)

MODEL = "WDX4_tRNA_rna004_v1_0"
REAL = "--real" in sys.argv[1:]
argv = [a for a in sys.argv[1:] if a != "--real"]
B = int(argv[0]) if argv else 1000
TRNA_BASELINE = 2630.0

model = load_model(MODEL)
spc = get_model_spc_config(MODEL)
L = spc.sig_preload_size
rng = np.random.default_rng(0)

sigs = np.zeros((B, L), np.float32)
lens = np.zeros(B, np.int32)
if REAL:
    # real mRNA fixture reads looped to fill B (wrong chemistry on purpose)
    from warpdemux_tpu.io.pod5 import yield_signal_batches

    import os

    fixture_dir = Path(
        os.environ.get(
            "WDX_FIXTURE_DIR", "/root/reference/test_data/live_balancing"
        )
    )
    fixtures = sorted(fixture_dir.glob("small_pod5_*.pod5"))
    if not fixtures:
        sys.exit(
            f"--real: no small_pod5_*.pod5 fixtures in {fixture_dir} "
            "(set WDX_FIXTURE_DIR to a directory with pod5 fixtures)"
        )
    real_sigs, real_lens = [], []
    for f in fixtures:
        for s, in_lens, _full, _ids in yield_signal_batches(
            [str(f)], None, None, batch_size=200, preload_size=L
        ):
            real_sigs.append(np.asarray(s, np.float32))
            real_lens.append(np.asarray(in_lens, np.int32))
    pool_s = np.concatenate(real_sigs)
    pool_l = np.concatenate(real_lens)
    idx = np.arange(B) % pool_s.shape[0]
    sigs, lens = pool_s[idx], pool_l[idx]
else:
    pats = trna_barcode_patterns(n_barcodes=4, n_events=25)
    for i in range(B):
        sig, _ = synth_trna_barcoded_read(rng, pats[i % 4])
        n = min(L, sig.size)
        sigs[i, :n] = sig[:n]
        lens[i] = n
step = make_demux_step(model, spc, input_format="pa")

resident = [
    (
        jax.device_put(sigs.astype(np.float32)),
        jax.device_put(lens.astype(np.int32)),
    )
    for _ in range(12)
]
jax.block_until_ready(resident)

res = step(*resident[0])
jax.device_get((res.pred, res.conf, res.success))

fetchq: queue.Queue = queue.Queue()
n_pass = [0]


def fetcher():
    while True:
        r = fetchq.get()
        if r is None:
            return
        _p, _c, s = jax.device_get((r.pred, r.conf, r.success))
        n_pass[0] += int(s.sum())


fetchers = [threading.Thread(target=fetcher) for _ in range(2)]
t0 = time.time()
for th in fetchers:
    th.start()
for b in resident:
    fetchq.put(step(*b))
for _ in fetchers:
    fetchq.put(None)
for th in fetchers:
    th.join()
rps = len(resident) * B / (time.time() - t0)
feed = "real-mRNA-fixture (wrong chemistry)" if REAL else "synthetic tRNA"
print(
    f"tRNA compute [{feed}]: {rps:.0f} reads/s "
    f"(= {rps / TRNA_BASELINE:.1f}x the 16-core reference tRNA baseline) "
    f"pass={n_pass[0]}/{len(resident) * B} backend={jax.default_backend()} B={B} L={L}"
)
