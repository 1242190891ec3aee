"""On-device op-level profile of the fused detect stage (VERDICT r2 item 1a).

Runs the production detect_boundaries_with_fallback under jax.profiler.trace
and prints the top XLA ops by total device time parsed from the perfetto
trace — dispatch-latency-free evidence of where the detect milliseconds go.

Usage: python tools/profile_detect_trace.py [B] [trace_dir]
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from warpdemux_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from bench import synth_minibatch
from warpdemux_tpu.config.utils import get_model_spc_config
from warpdemux_tpu.detect.boundaries import detect_boundaries_with_fallback

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
TRACE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wdx_detect_trace"
L = 10000
REPS = 6

rng = np.random.default_rng(0)
spc = get_model_spc_config("WDX4_rna004_v1_0")
dcfg = spc.detect

adc, offset, scale, lens = synth_minibatch(rng, B, L)
signals = (adc.astype(np.float32) + offset[:, None]) * scale[:, None]
d_signals = jax.device_put(signals)
d_lens = jax.device_put(lens.astype(np.int32))

cnn_params = None
if dcfg.method == "cnn":
    from warpdemux_tpu.detect import cnn as cnn_mod

    cnn_params = cnn_mod.load_params(spc.cnn_model_name)

fn = jax.jit(lambda s, n: detect_boundaries_with_fallback(s, n, dcfg, cnn_params))
out = fn(d_signals, d_lens)
jax.block_until_ready(out)

t0 = time.perf_counter()
for _ in range(REPS):
    out = fn(d_signals, d_lens)
jax.block_until_ready(out)
wall = (time.perf_counter() - t0) / REPS
print(f"# detect wall: {wall*1e3:.2f} ms/minibatch ({B/wall:.0f} reads/s)")

with jax.profiler.trace(TRACE):
    for _ in range(REPS):
        out = fn(d_signals, d_lens)
    jax.block_until_ready(out)

# parse the perfetto trace: sum device-lane slice durations by op name
files = sorted(glob.glob(f"{TRACE}/**/*.trace.json.gz", recursive=True))
if not files:
    print("no trace written", file=sys.stderr)
    sys.exit(1)
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)

# find TPU device-op track pids (process names like "/device:TPU:0" or "TPU ... Chip")
pid_name = {}
tid_name = {}
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_name[ev["pid"]] = ev["args"].get("name", "")
    if ev.get("ph") == "M" and ev.get("name") == "thread_name":
        tid_name[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

dev_pids = {p for p, n in pid_name.items() if "TPU" in n or "device" in n.lower()}
tot = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for ev in trace["traceEvents"]:
    if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
        continue
    tname = tid_name.get((ev["pid"], ev["tid"]), "")
    if "step" in tname.lower():
        continue  # step lanes duplicate op lanes
    dur = ev.get("dur", 0) / 1e3  # us -> ms
    name = ev.get("name", "?")
    tot[name] += dur
    cnt[name] += 1
    total += dur

print(f"# device total: {total/REPS:.2f} ms/minibatch over {REPS} reps")
print("| op | ms/minibatch | calls/mb | % |")
print("|---|---|---|---|")
for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
    print(
        f"| {name[:70]} | {ms/REPS:8.3f} | {cnt[name]//REPS} |"
        f" {100*ms/max(total,1e-9):5.1f} |"
    )
