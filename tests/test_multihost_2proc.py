"""True 2-process jax.distributed test (VERDICT r1 item 9).

Spawns two separate Python processes that initialize jax.distributed over
a local coordinator, shard the input file list per host, and all-reduce
per-class counters through global_class_counts' pmap psum path — the path
tests/test_multihost.py can only exercise in its single-process degenerate
form. Fails if the psum path or the distributed init wiring regresses.
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.getcwd())
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    from warpdemux_tpu.parallel.multihost import (
        global_class_counts, host_shard_tag, shard_files,
    )

    files = [f"f{i}.pod5" for i in range(7)]
    mine = shard_files(files)
    # round-robin: host 0 gets 0,2,4,6; host 1 gets 1,3,5
    want = [f for i, f in enumerate(files) if i % 2 == pid]
    assert mine == want, (mine, want)
    assert host_shard_tag() == f"h{pid:03d}"

    local = np.arange(5, dtype=np.int32) + 10 * (pid + 1)  # distinct per host
    total = global_class_counts(local)
    want_total = (np.arange(5) + 10) + (np.arange(5) + 20)
    assert (total == want_total).all(), (total, want_total)
    print(f"proc {pid} ok: {total.tolist()}")
    """
)


def test_two_process_distributed_counts(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            cwd=str(Path(__file__).resolve().parents[1]),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out, out
