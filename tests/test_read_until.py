"""Tests for the read-until client core (live/read_until.py) and the
preallocated accumulating cache (live/caches.py), driven by an in-process
fake transport — the same pattern the reference uses to test device-coupled
behavior without a sequencer (SURVEY 4.2)."""

import threading
import time

import numpy as np

from warpdemux_tpu.live.caches import LiveRead, PreallocAccumulatingCache
from warpdemux_tpu.live.read_until import Action, ReadChunk, ReadUntilClient


class FakeTransport:
    """Feeds scripted responses; records actions."""

    def __init__(self, responses):
        self.responses = responses
        self.sent_actions: list[Action] = []
        self.started_with = None
        self._consumed = threading.Event()

    def start(self, setup):
        self.started_with = setup

        def gen():
            for r in self.responses:
                yield r
                time.sleep(0.005)
            self._consumed.set()
            # keep the stream open briefly so trailing actions drain
            for _ in range(20):
                yield _Resp()
                time.sleep(0.005)

        return gen()

    def send_actions(self, actions):
        self.sent_actions.extend(actions)


class _Resp:
    def __init__(self, chunks=(), action_responses=()):
        self.chunks = list(chunks)
        self.action_responses = list(action_responses)


def _chunk(channel, read_id, number, sig, cls=("adapter",), start=0):
    return ReadChunk(
        channel=channel,
        read_id=read_id,
        read_number=number,
        signal=np.asarray(sig, np.float32),
        chunk_start=start,
        chunk_classifications=cls,
    )


def test_accumulation_and_min_chunk_length():
    responses = [
        _Resp([_chunk(1, "r1", 7, np.ones(300))]),
        _Resp([_chunk(1, "r1", 7, np.ones(300))]),
    ]
    tr = FakeTransport(responses)
    client = ReadUntilClient(tr, prefilter_classes={"adapter"})
    client.run()
    tr._consumed.wait(2)
    got = client.get_read_chunks(min_chunk_length=500)
    client.reset()
    assert len(got) == 1
    ch, read = got[0]
    assert ch == 1 and read.read_id == "r1"
    assert read.signal.size == 600  # both chunks accumulated


def test_prefilter_classes_majority_rule():
    responses = [
        _Resp(
            [
                _chunk(1, "ok", 1, np.ones(100), cls=("adapter", "adapter")),
                _chunk(2, "bad", 2, np.ones(100), cls=("strand", "strand")),
                _chunk(3, "tie", 3, np.ones(100), cls=("adapter", "strand")),
            ]
        )
    ]
    tr = FakeTransport(responses)
    client = ReadUntilClient(tr, prefilter_classes={"adapter"})
    client.run()
    tr._consumed.wait(2)
    got = dict(client.get_read_chunks())
    client.reset()
    # > half must be in the allowed classes: "ok" passes, "bad" and the
    # 50/50 "tie" are dropped (reference base.py:352-400)
    assert set(r.read_id for r in got.values()) == {"ok"}


def test_decision_suppression_and_actions():
    responses = [
        _Resp([_chunk(1, "r1", 1, np.ones(100))]),
        _Resp([_chunk(1, "r1", 1, np.ones(100))]),  # after decision: dropped
    ]
    tr = FakeTransport(responses)
    client = ReadUntilClient(tr, prefilter_classes=set())
    client.run()
    got = []
    for _ in range(100):  # poll: the runner thread needs a moment
        got = client.get_read_chunks()
        if got:
            break
        time.sleep(0.01)
    assert got
    ch, read = got[0]
    aid = client.unblock_read(ch, read, duration=0.5)
    tr._consumed.wait(2)
    client.reset()
    # the action reached the transport
    acts = [a for a in tr.sent_actions if a.action_id == aid]
    assert len(acts) == 1
    assert acts[0].action == "unblock" and acts[0].duration == 0.5
    # later chunks of the decided read are suppressed
    assert client.get_read_chunks() == []
    assert client.decided_reads["r1"] == "unblock"


def test_action_response_counting():
    tr = FakeTransport([_Resp(action_responses=["a1", "a1", "a2"])])
    client = ReadUntilClient(tr)
    client.run()
    tr._consumed.wait(2)
    client.reset()
    assert client.action_responses == {"a1": 2, "a2": 1}


def test_prealloc_cache_accumulates_without_allocation():
    cache = PreallocAccumulatingCache(size=4, max_raw_signal=500)
    r = lambda n, num: LiveRead(
        channel=1, read_id="x", read_number=num,
        signal=np.full(n, 7.0, np.float32),
    )
    cache.set(1, r(300, 1))
    cache.set(1, r(300, 1))  # accumulates, truncated at 500
    items = cache.pop_all()
    assert len(items) == 1
    assert items[0][1].signal.size == 500
    # same read, new data after pop -> fresh again with more samples kept
    assert cache.pop_all() == []
    cache.set(1, r(10, 2))  # new read resets the buffer
    items = cache.pop_all()
    assert items[0][1].signal.size == 10
    assert items[0][1].read_number == 2


def test_prealloc_cache_capacity():
    cache = PreallocAccumulatingCache(size=2, max_raw_signal=100)
    for ch in (1, 2, 3):
        cache.set(
            ch,
            LiveRead(
                channel=ch, read_id=f"r{ch}", read_number=ch,
                signal=np.ones(10, np.float32),
            ),
        )
    assert cache.missed == 1
    assert len(cache.pop_all()) == 2
