"""KV cache event publishing (prefix-aware routing support).

Ref analog: vllm/distributed/kv_events.py (BlockStored:50,
BlockRemoved:97, AllBlocksCleared:115, ZmqEventPublisher:297 — ZMQ PUB
of seq-numbered msgpack batches + a replay socket so late subscribers
can backfill missed batches).

External consumers (prefix-aware routers, KV-cache telemetry) follow
the BlockPool's content-addressed cache state by replaying the event
stream: BlockStored when block hashes become cached, BlockRemoved when
eviction drops them, AllBlocksCleared on reset. Hashes are the pool's
chained content hashes (csrc/block_hash.cc FNV chain — process-stable),
so the reconstructed prefix state is exact.

Wire format per ZMQ message: [topic, seq (8B big-endian), payload]
where payload = msgpack([ts, [[kind, ...fields], ...]]).
Replay: REQ a big-endian 8-byte start seq to the replay socket; the
publisher streams [seq, payload] pairs from its ring buffer followed
by an empty delimiter + the next expected seq.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional, Union

import msgpack

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


@dataclass
class BlockStored:
    block_hashes: list[int]
    parent_block_hash: Optional[int]
    token_ids: list[int]
    block_size: int
    lora_id: Optional[int] = None
    medium: Optional[str] = "GPU"

    def pack(self) -> list:
        return ["stored", self.block_hashes, self.parent_block_hash,
                self.token_ids, self.block_size, self.lora_id,
                self.medium]


@dataclass
class BlockRemoved:
    block_hashes: list[int]
    medium: Optional[str] = "GPU"

    def pack(self) -> list:
        return ["removed", self.block_hashes, self.medium]


@dataclass
class AllBlocksCleared:

    def pack(self) -> list:
        return ["cleared"]


KVCacheEvent = Union[BlockStored, BlockRemoved, AllBlocksCleared]


def unpack_event(row: list) -> KVCacheEvent:
    kind = row[0]
    if kind == "stored":
        return BlockStored(block_hashes=row[1], parent_block_hash=row[2],
                           token_ids=row[3], block_size=row[4],
                           lora_id=row[5], medium=row[6])
    if kind == "removed":
        return BlockRemoved(block_hashes=row[1], medium=row[2])
    if kind == "cleared":
        return AllBlocksCleared()
    raise ValueError(f"unknown KV event kind {kind!r}")


@dataclass
class EventBatch:
    ts: float
    events: list[KVCacheEvent] = field(default_factory=list)

    def pack(self) -> bytes:
        return msgpack.packb(
            [self.ts, [e.pack() for e in self.events]],
            use_bin_type=True)

    @classmethod
    def unpack(cls, payload: bytes) -> "EventBatch":
        ts, rows = msgpack.unpackb(payload, raw=False)
        return cls(ts=ts, events=[unpack_event(r) for r in rows])


class KVEventSink:
    """Step-scoped event accumulator handed to BlockPool: the pool
    appends events synchronously; the engine flushes once per step."""

    def __init__(self) -> None:
        self._pending: list[KVCacheEvent] = []

    def emit(self, event: KVCacheEvent) -> None:
        self._pending.append(event)

    def drain(self) -> list[KVCacheEvent]:
        out, self._pending = self._pending, []
        return out


class ZmqEventPublisher:
    """PUB socket with per-batch sequence numbers and a bounded replay
    ring served over a REP socket (ref ZmqEventPublisher:297)."""

    def __init__(self, endpoint: str = "tcp://*:5557",
                 replay_endpoint: Optional[str] = None,
                 topic: str = "", buffer_steps: int = 10_000) -> None:
        import zmq
        self._ctx = zmq.Context.instance()
        self._pub = self._ctx.socket(zmq.PUB)
        self._pub.bind(endpoint)
        self._topic = topic.encode()
        self._seq = 0
        self._buffer: deque[tuple[int, bytes]] = deque(
            maxlen=buffer_steps)
        self._lock = threading.Lock()
        self._replay_thread = None
        self._stop = threading.Event()
        if replay_endpoint:
            self._replay = self._ctx.socket(zmq.REP)
            self._replay.bind(replay_endpoint)
            self._replay_thread = threading.Thread(
                target=self._serve_replay, daemon=True)
            self._replay_thread.start()

    def publish(self, events: list[KVCacheEvent]) -> None:
        if not events:
            return
        payload = EventBatch(ts=time.time(), events=events).pack()
        with self._lock:
            seq = self._seq
            self._seq += 1
            self._buffer.append((seq, payload))
            self._pub.send_multipart(
                [self._topic, seq.to_bytes(8, "big"), payload])

    def _serve_replay(self) -> None:
        import zmq
        poller = zmq.Poller()
        poller.register(self._replay, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(timeout=100)):
                continue
            try:
                frame = self._replay.recv()
                start = int.from_bytes(frame[:8], "big")
                with self._lock:
                    rows = [(s, p) for s, p in self._buffer if s >= start]
                    nxt = self._seq
                parts: list[bytes] = []
                for s, p in rows:
                    parts += [s.to_bytes(8, "big"), p]
                parts += [b"", nxt.to_bytes(8, "big")]
                self._replay.send_multipart(parts)
            except Exception:  # socket closed during shutdown
                if self._stop.is_set():
                    return
                logger.exception("kv-events replay request failed")

    def close(self) -> None:
        self._stop.set()
        if self._replay_thread is not None:
            self._replay_thread.join(timeout=1.0)
            self._replay.close(linger=0)
        self._pub.close(linger=0)
