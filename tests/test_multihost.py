"""Multi-host helper tests (single-process semantics + file sharding)."""

import numpy as np

from warpdemux_tpu.parallel import multihost as mh


def test_shard_files_partition():
    files = [f"f{i}.pod5" for i in range(10)]
    shards = [mh.shard_files(files, pi, 3) for pi in range(3)]
    # disjoint, complete, deterministic
    all_files = sorted(f for s in shards for f in s)
    assert all_files == sorted(files)
    assert len(set(map(tuple, shards))) == 3


def test_host_shard_tag():
    assert mh.host_shard_tag(0) == "h000"
    assert mh.host_shard_tag(42) == "h042"


def test_global_counts_single_process_identity():
    c = np.array([5, 3, 2, 0, 1], np.int32)
    out = mh.global_class_counts(c)
    np.testing.assert_array_equal(out, c)


def test_init_distributed_single_host():
    pi, pc = mh.init_distributed()
    assert pi == 0 and pc == 1
