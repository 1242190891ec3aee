"""Per-channel read caches for the live-read stream.

Capability parity with the reference's vendored read_until caches
(warpdemux/read_until/read_cache.py): `ReadCache` keeps the latest chunk per
channel with oldest-channel eviction; `AccumulatingCache` concatenates
successive raw chunks of the same read up to a byte budget so multi-chunk
classification can re-analyze the full prefix.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np


@dataclass
class LiveRead:
    """A (possibly accumulated) chunk of a read in progress."""

    channel: int
    read_id: str
    read_number: int
    signal: np.ndarray  # calibrated pA, float32
    chunk_start: int = 0
    chunk_classifications: tuple = ()


class ReadCache:
    """Latest chunk per channel; evicts the oldest channel when full."""

    def __init__(self, size: int = 512):
        if size < 1:
            raise ValueError("size must be >= 1")
        self.size = size
        self._dict: OrderedDict[int, LiveRead] = OrderedDict()
        self._lock = threading.RLock()
        self.missed = 0
        self.replaced = 0

    def __len__(self):
        with self._lock:
            return len(self._dict)

    def set(self, channel: int, read: LiveRead) -> None:
        with self._lock:
            if channel in self._dict:
                old = self._dict.pop(channel)
                if old.read_number == read.read_number:
                    self.replaced += 1
                else:
                    self.missed += 1
            elif len(self._dict) >= self.size:
                self._dict.popitem(last=False)
                self.missed += 1
            self._dict[channel] = read

    def pop_all(self) -> list[tuple[int, LiveRead]]:
        with self._lock:
            items = list(self._dict.items())
            self._dict.clear()
            return items


class AccumulatingCache(ReadCache):
    """Concatenates chunks of the same read (reference
    read_until/read_cache.py:153-284) up to `max_raw_signal` samples."""

    def __init__(self, size: int = 512, max_raw_signal: int = 12000):
        super().__init__(size)
        self.max_raw_signal = max_raw_signal

    def set(self, channel: int, read: LiveRead) -> None:
        with self._lock:
            prev = self._dict.get(channel)
            if prev is not None and prev.read_number == read.read_number:
                joined = np.concatenate([prev.signal, read.signal])
                if joined.size > self.max_raw_signal:
                    joined = joined[: self.max_raw_signal]
                read = LiveRead(
                    channel=read.channel,
                    read_id=read.read_id,
                    read_number=read.read_number,
                    signal=joined,
                    chunk_start=prev.chunk_start,
                    chunk_classifications=prev.chunk_classifications
                    + read.chunk_classifications,
                )
                self._dict.pop(channel)
                self._dict[channel] = read
                self.replaced += 1
            else:
                super().set(channel, read)
