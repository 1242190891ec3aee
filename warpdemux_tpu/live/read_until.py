"""Read-until (adaptive sampling) stream client.

Capability parity with the reference's vendored+patched ONT read_until_api
v3.4.1 (warpdemux/read_until/base.py): a runner thread drives MinKNOW's
bidirectional get_live_reads stream — pushing raw-data chunks into a
per-channel cache and draining an action queue of unblock /
stop-receiving requests — while the analysis loop consumes
`get_read_chunks`. The WarpDemuX-specific patches are reproduced:

- decision tracking keyed on read *id*, with per-channel latest-decision
  suppression (base.py:152-153, 375-399): chunks of a read that already
  received a decision are dropped,
- multi-chunk accumulation workflow (one_chunk=False + filter_strands +
  prefilter_classes): a chunk batch entry is yielded only if more than
  half of its accumulated chunk classifications are in the allowed classes
  and the accumulated length reaches min_chunk_length (base.py:352-400),
- action responses are counted per action id.

The MinKNOW wire protocol lives behind a small transport interface so the
client core is testable without a sequencer: `transport.start(setup)`
returns a response iterator, `transport.send_actions(actions)` submits
decisions. A gRPC transport for a real MinKNOW (requires the external
`minknow_api` package) plugs in via `minknow_transport()`; the dummy
harness (live/dummy.py) and tests use in-process fakes.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field

import numpy as np

from warpdemux_tpu.live.caches import AccumulatingCache, LiveRead


@dataclass
class ReadChunk:
    """One raw-data chunk from the stream (transport-normalized)."""

    channel: int
    read_id: str
    read_number: int
    signal: np.ndarray  # calibrated pA f32 (or ADC if calibration off)
    chunk_start: int = 0  # sample index where this chunk's data begins
    start_sample: int = 0  # sample index where the READ began (MinKNOW
    # read.start_sample; chunk_start - start_sample = observations missed
    # before the first captured chunk)
    chunk_classifications: tuple = ()


@dataclass
class Action:
    """A decision sent back on the stream."""

    action_id: str
    channel: int
    read_id: str
    read_number: int
    action: str  # "unblock" | "stop_further_data"
    duration: float = 0.1


class ReadUntilClient:
    """Transport-driven read-until client (reference base.py:237-653)."""

    def __init__(
        self,
        transport,
        cache=None,
        one_chunk: bool = False,
        filter_strands: bool = True,
        prefilter_classes: set[str] | None = None,
        calibrated_signal: bool = True,
        first_channel: int = 1,
        last_channel: int = 512,
    ):
        self.transport = transport
        self.cache = cache if cache is not None else AccumulatingCache()
        self.one_chunk = one_chunk
        self.filter_strands = filter_strands
        self.prefilter_classes = set(prefilter_classes or ())
        self.calibrated_signal = calibrated_signal
        self.first_channel = first_channel
        self.last_channel = last_channel

        self._action_queue: queue.Queue[Action] = queue.Queue()
        self._running = threading.Event()
        self._runner: threading.Thread | None = None
        # patched decision tracking: read id -> decision, and per channel
        # the read id of the latest decided read (base.py:152-153)
        self.decided_reads: dict[str, str] = {}
        self.channel_read_latest_decision: dict[int, str] = {}
        self.action_responses: dict[str, int] = {}
        self.log = logging.getLogger("read_until")

    # ---- lifecycle -------------------------------------------------------

    @property
    def is_running(self) -> bool:
        return self._running.is_set()

    def run(self):
        """Start the stream runner thread."""
        if self.is_running:
            return
        self._running.set()
        self._runner = threading.Thread(target=self._run, daemon=True)
        self._runner.start()

    def reset(self):
        self._running.clear()
        if self._runner is not None:
            self._runner.join(timeout=5)
            self._runner = None

    def _run(self):
        setup = dict(
            first_channel=self.first_channel,
            last_channel=self.last_channel,
            raw_data_type="calibrated" if self.calibrated_signal else "adc",
        )
        try:
            responses = self.transport.start(setup)
            for resp in responses:
                if not self.is_running:
                    break
                self._process_response(resp)
                self._drain_actions()
        except Exception:
            self.log.exception("read_until stream failed")
        finally:
            self._running.clear()

    def _process_response(self, resp):
        # action acknowledgements
        for aid in getattr(resp, "action_responses", ()):
            self.action_responses[aid] = self.action_responses.get(aid, 0) + 1
        for chunk in getattr(resp, "chunks", ()):
            # drop chunks of reads we've already decided on
            if (
                self.channel_read_latest_decision.get(chunk.channel)
                == chunk.read_id
            ):
                continue
            self.cache.set(
                chunk.channel,
                LiveRead(
                    channel=chunk.channel,
                    read_id=chunk.read_id,
                    read_number=chunk.read_number,
                    signal=np.asarray(chunk.signal, np.float32),
                    chunk_start=chunk.chunk_start,
                    start_sample=chunk.start_sample,
                    chunk_classifications=tuple(chunk.chunk_classifications),
                ),
            )

    def _drain_actions(self):
        actions = []
        while True:
            try:
                actions.append(self._action_queue.get_nowait())
            except queue.Empty:
                break
        if actions:
            self.transport.send_actions(actions)

    # ---- consumption -----------------------------------------------------

    def get_read_chunks(
        self, batch_size: int = 512, last: bool = True,
        min_chunk_length: int = 0,
    ):
        """Yield (channel, LiveRead) pairs passing the accumulation filters
        (reference base.py:352-400)."""
        items = self.cache.pop_all()
        if last:
            items = items[-batch_size:]
        else:
            items = items[:batch_size]
        out = []
        for channel, read in items:
            if self.channel_read_latest_decision.get(channel) == read.read_id:
                continue
            if read.signal.size < min_chunk_length:
                # too short: put back for further accumulation
                self.cache.set(channel, read)
                continue
            if self.filter_strands and self.prefilter_classes:
                cls = read.chunk_classifications
                if cls:
                    n_ok = sum(1 for c in cls if c in self.prefilter_classes)
                    if n_ok * 2 <= len(cls):
                        continue
            out.append((channel, read))
        return out

    # ---- decisions -------------------------------------------------------

    def _enqueue(self, action: str, channel: int, read, duration: float):
        read_id = read.read_id if hasattr(read, "read_id") else str(read)
        number = getattr(read, "read_number", -1)
        aid = str(uuid.uuid4())
        self._action_queue.put(
            Action(
                action_id=aid,
                channel=channel,
                read_id=read_id,
                read_number=number,
                action=action,
                duration=duration,
            )
        )
        self.decided_reads[read_id] = action
        self.channel_read_latest_decision[channel] = read_id
        return aid

    def unblock_read(self, channel: int, read, duration: float = 0.1):
        return self._enqueue("unblock", channel, read, duration)

    def stop_receiving_read(self, channel: int, read):
        return self._enqueue("stop_further_data", channel, read, 0.0)


def minknow_transport(mk_host: str = "127.0.0.1", mk_port: int | None = None,
                      device: str | None = None):
    """Build a transport backed by a real MinKNOW via the external
    `minknow_api` package (not bundled in this environment)."""
    try:
        import minknow_api  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "minknow_api is required for a live MinKNOW connection; use the "
            "dummy harness (live/dummy.py) otherwise"
        ) from e
    from warpdemux_tpu.live.minknow_grpc import MinknowTransport

    return MinknowTransport(mk_host, mk_port, device)
