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


def test_two_process_cli_demux(tmp_path):
    """VERDICT r2 #3: multi-host as a CLI capability. Two processes run the
    actual CLI against the same 2-file input with --coordinator/--num-
    processes/--process-id; each host must take a disjoint file shard,
    write host-tagged output shards, and log psum'd GLOBAL counts."""
    import glob

    import pandas as pd

    fixtures = [
        f"/root/reference/test_data/live_balancing/small_pod5_{i}.pod5"
        for i in range(2)
    ]
    if not all(Path(f).exists() for f in fixtures):
        pytest.skip("pod5 fixtures unavailable")

    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    out_dir = tmp_path / "run"
    out_dir.mkdir()
    env_script = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, os.getcwd())
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("XLA_FLAGS", None)
        from warpdemux_tpu.cli import main
        sys.exit(main(sys.argv[1:]) or 0)
        """
    )
    script = tmp_path / "cli_worker.py"
    script.write_text(env_script)

    def run(pid):
        return subprocess.Popen(
            [
                sys.executable, str(script), "demux",
                "-i", *fixtures,
                "-o", str(out_dir),
                "-m", "WDX4_rna004_v1_0",
                "-b", "64",
                "--no-create_subdir",
                "--jax-platform", "cpu",
                "--coordinator", coord,
                "--num-processes", "2",
                "--process-id", str(pid),
            ],
            cwd=str(Path(__file__).resolve().parents[1]),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )

    procs = [run(0), run(1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    # host-tagged shards for both hosts
    pred_files = sorted(glob.glob(str(out_dir / "predictions" / "*.csv.gz")))
    tags = {Path(f).name.split("_")[2] for f in pred_files}
    assert tags == {"h000", "h001"}, pred_files

    # disjoint read sets: each host processed only its file shard
    by_host = {}
    for tag in ("h000", "h001"):
        frames = [
            pd.read_csv(f)
            for f in glob.glob(str(out_dir / "predictions" / f"*_{tag}_*"))
        ]
        by_host[tag] = set(pd.concat(frames)["#read_id"])
    assert not (by_host["h000"] & by_host["h001"])

    # global psum'd summary appears in both logs with total == 400 reads
    # (2 fixtures x 200)
    for out in outs:
        assert "GLOBAL (2 hosts): 400 reads" in out, out[-2000:]
    # and every read landed in predictions or failed_reads
    fails = [
        pd.read_csv(f)
        for f in glob.glob(str(out_dir / "failed_reads" / "*.csv.gz"))
    ]
    n_fail = sum(len(f) for f in fails)
    n_pred = len(by_host["h000"]) + len(by_host["h001"])
    assert n_pred + n_fail == 400


def test_four_process_cli_matches_single_process(tmp_path):
    """VERDICT r4 #7: 4-process file-sharded run == single-process run.

    The same 4-file input demuxed (a) in one process and (b) across four
    jax.distributed processes (round-robin file shards, h00x-tagged output
    shards) must yield BYTE-IDENTICAL per-read predictions after merging,
    and the psum'd GLOBAL counters must equal the single-process totals.
    This also pins row independence of the fused step: the two runs batch
    the same reads differently, so any cross-row leak would diverge them.
    """
    import glob

    import pandas as pd

    fixtures = [
        f"/root/reference/test_data/live_balancing/small_pod5_{i}.pod5"
        for i in range(4)
    ]
    if not all(Path(f).exists() for f in fixtures):
        pytest.skip("pod5 fixtures unavailable")

    env_script = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, os.getcwd())
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("XLA_FLAGS", None)
        from warpdemux_tpu.cli import main
        sys.exit(main(sys.argv[1:]) or 0)
        """
    )
    script = tmp_path / "cli_worker.py"
    script.write_text(env_script)
    repo = str(Path(__file__).resolve().parents[1])

    def read_merged(out_dir, col="#read_id"):
        frames = [
            pd.read_csv(f)
            for f in sorted(glob.glob(str(out_dir / "predictions" / "*.csv.gz")))
        ]
        df = pd.concat(frames, ignore_index=True)
        return df.sort_values(col).reset_index(drop=True)

    # single-process reference
    solo_dir = tmp_path / "solo"
    solo_dir.mkdir()
    solo = subprocess.run(
        [
            sys.executable, str(script), "demux", "-i", *fixtures,
            "-o", str(solo_dir), "-m", "WDX4_rna004_v1_0", "-b", "64",
            "--no-create_subdir", "--jax-platform", "cpu",
        ],
        cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert solo.returncode == 0, solo.stdout[-3000:] + solo.stderr[-2000:]

    # 4-process sharded run
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    out_dir = tmp_path / "run4"
    out_dir.mkdir()
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(script), "demux", "-i", *fixtures,
                "-o", str(out_dir), "-m", "WDX4_rna004_v1_0", "-b", "64",
                "--no-create_subdir", "--jax-platform", "cpu",
                "--coordinator", coord, "--num-processes", "4",
                "--process-id", str(pid),
            ],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    # all four host tags present, shards disjoint
    pred_files = sorted(glob.glob(str(out_dir / "predictions" / "*.csv.gz")))
    tags = {Path(f).name.split("_")[2] for f in pred_files}
    assert tags == {"h000", "h001", "h002", "h003"}, pred_files

    merged = read_merged(out_dir)
    solo_df = read_merged(solo_dir)
    # byte-identical predictions: same reads, same calls, same confidences
    pd.testing.assert_frame_equal(merged, solo_df)

    # GLOBAL psum counters in every process log equal the single-process
    # totals (800 reads over 4 fixtures)
    import re

    want_global = None
    for out in outs:
        m = re.search(
            r"GLOBAL \(4 hosts\): (\d+) reads \((\d+) pass / (\d+) fail / "
            r"(\d+) predicted\)",
            out,
        )
        assert m, out[-2000:]
        got = tuple(int(v) for v in m.groups())
        want_global = want_global or got
        assert got == want_global
    assert want_global[0] == 800
    m = re.search(
        r"demux done: (\d+) reads \((\d+) pass / (\d+) fail / (\d+) "
        r"predicted\)",
        solo.stdout,
    )
    assert m, solo.stdout[-2000:]
    assert tuple(int(v) for v in m.groups()) == want_global

    # fail shards also merge to the same read set
    def fail_ids(d):
        frames = [
            pd.read_csv(f)
            for f in glob.glob(str(d / "failed_reads" / "*.csv.gz"))
        ]
        return set(pd.concat(frames)["read_id"]) if frames else set()

    assert fail_ids(out_dir) == fail_ids(solo_dir)
