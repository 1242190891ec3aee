"""pod5 ingest tests against the real fixture files in the reference mount."""

from pathlib import Path

import numpy as np
import pytest

from warpdemux_tpu.io.pod5 import Pod5Reader, yield_signal_batches, count_reads
from warpdemux_tpu.io import vbz

FIXTURES = sorted(
    Path("/root/reference/test_data/live_balancing").glob("small_pod5_*.pod5")
)

pytestmark = pytest.mark.skipif(
    not FIXTURES, reason="pod5 fixtures unavailable"
)


def test_vbz_roundtrip():
    rng = np.random.default_rng(0)
    sig = rng.integers(-2000, 2000, size=5000).astype(np.int16)
    # random walk-ish small deltas too
    sig2 = np.cumsum(rng.integers(-30, 30, size=8000)).astype(np.int16)
    for s in (sig, sig2, np.zeros(1, np.int16), np.array([5], np.int16)):
        enc = vbz.encode(s)
        dec = vbz.decode(enc, len(s))
        np.testing.assert_array_equal(dec, s)


def test_reader_basic():
    r = Pod5Reader(FIXTURES[0])
    assert len(r) == 200
    recs = list(r.reads())
    assert len(recs) == 200
    rec = recs[0]
    assert len(rec.read_id) == 36  # uuid string
    sig = rec.signal_pa
    assert sig.shape == (rec.num_samples,)
    assert sig.dtype == np.float32
    # plausible picoampere range for RNA004 direct RNA
    assert 0 < np.median(sig) < 300
    # head decode matches full decode
    head = rec.signal_pa_head(1000)
    np.testing.assert_array_equal(head, sig[:1000])


def test_reader_selection():
    r = Pod5Reader(FIXTURES[0])
    ids = [rec.read_id for rec in r.reads()][:5]
    got = [rec.read_id for rec in r.reads(selection=ids[:3])]
    assert sorted(got) == sorted(ids[:3])
    with pytest.raises(KeyError):
        list(r.reads(selection=["not-a-read-id"], missing_ok=False))


def test_count_reads():
    assert count_reads(FIXTURES[:2]) == 400


def test_yield_signal_batches_shapes():
    batches = list(
        yield_signal_batches(FIXTURES[:1], None, None, batch_size=64, preload_size=4000)
    )
    assert sum(b[0].shape[0] for b in batches) == 200
    sigs, in_len, full_len, rids = batches[0]
    assert sigs.shape == (64, 4000)
    assert np.all(in_len <= 4000)
    assert np.all(full_len >= in_len)
    # padding region is zeros
    row = np.argmin(in_len)
    assert np.all(sigs[row, in_len[row]:] == 0.0)
    # exclusion filter
    excl = set(rids[:10])
    b2 = list(
        yield_signal_batches(FIXTURES[:1], None, excl, batch_size=512, preload_size=100)
    )
    assert sum(b[0].shape[0] for b in b2) == 190
