"""Host (CPU RAM) KV tier + disaggregated P/D transfer payloads.

Ref analog: vllm/v1/kv_offload/ (OffloadingManager, CPU backend) and
vllm/distributed/kv_transfer/ (connector payloads). TPU-native design:
the *device-free* scheduler decides what moves (it owns hashes and
block lifecycles); the runner executes bulk block copies with two jitted
primitives (gather / donated scatter) so swap-in never reallocates the
cache.

Flow:
- BlockPool evicts a cached block  ->  scheduler queues (block_id, hash)
  in SchedulerOutput.offload_blocks  ->  runner copies the block to the
  HostKVPool *before* the forward that overwrites it.
- A new request misses device prefix cache but its next block hashes
  are in the host pool  ->  scheduler allocates device blocks for them
  and emits SchedulerOutput.swap_in_blocks  ->  runner uploads before
  the forward; the request's computed-token count skips those blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

BlockHash = bytes


@dataclass
class KVTransferPayload:
    """Disagg P/D: one request's KV blocks, host-side (msgpack-able).

    data: per layer, array [n_blocks, 2*KH, bs, Dp] (numpy).
    scales: per layer, per-token-head scale planes (QuantKV only).
    """
    num_tokens: int
    data: list[np.ndarray]
    scales: Optional[list[np.ndarray]] = None


class HostKVPool:
    """LRU host pool of offloaded blocks, keyed by content hash.

    One entry = one block's KV across all layers:
    data [L, 2*KH, bs, Dp] (+ scales [L, SP2, LANE] for QuantKV).
    """

    def __init__(self, max_bytes: int) -> None:
        self.max_bytes = max_bytes
        self._bytes = 0
        # Ordered dict as LRU: oldest first.
        self._entries: dict[BlockHash, tuple] = {}
        self.stores = 0
        self.hits = 0
        self.evictions = 0

    def __contains__(self, h: BlockHash) -> bool:
        return h in self._entries

    @staticmethod
    def _nbytes(entry: tuple) -> int:
        return sum(a.nbytes for a in entry if a is not None)

    def store(self, h: BlockHash, data: np.ndarray,
              scales: Optional[np.ndarray] = None) -> None:
        if h in self._entries:
            self._entries.pop(h)
        else:
            self.stores += 1
        entry = (data, scales)
        need = self._nbytes(entry)
        while self._bytes + need > self.max_bytes and self._entries:
            self._evict_oldest()
        if need <= self.max_bytes:
            self._entries[h] = entry
            self._bytes += need

    def _evict_oldest(self) -> None:
        """Drop the LRU entry. TieredHostKVPool overrides this to
        demote to the next tier instead of discarding."""
        oldest = next(iter(self._entries))
        self._bytes -= self._nbytes(self._entries.pop(oldest))
        self.evictions += 1

    def get(self, h: BlockHash) -> Optional[tuple]:
        entry = self._entries.get(h)
        if entry is not None:
            self.hits += 1
            # refresh LRU position
            self._entries.pop(h)
            self._entries[h] = entry
        return entry

    @property
    def num_blocks(self) -> int:
        return len(self._entries)


class FileKVTier:
    """Filesystem spill tier with asynchronous write-behind.

    Ref analog: the fs/object tiers under vllm/v1/kv_offload/tiering/
    and the async CPU<->storage swap machinery (cpu/swap_blocks): RAM-
    tier evictions demote here instead of vanishing; prefix-cache
    lookups reach through RAM into this tier. One file per block hash
    (data + optional scale planes), an in-memory LRU index bounded by
    ``max_bytes``, and a single daemon writer thread so the serving
    loop never blocks on disk (the reference's dedicated swap CUDA
    stream, re-expressed as host-side write-behind). An object-store
    tier is the same interface with put/get re-pointed at a client —
    this class is the pluggable on-disk implementation.
    """

    def __init__(self, directory: str, max_bytes: int) -> None:
        import os
        import queue
        import threading
        self.dir = directory
        self.max_bytes = max_bytes
        os.makedirs(directory, exist_ok=True)
        self._bytes = 0
        self._index: dict[BlockHash, int] = {}  # LRU: oldest first
        # Entries queued for write: readable before they land on disk.
        self._inflight: dict[BlockHash, tuple] = {}
        self._lock = threading.Lock()
        self._q: "queue.Queue" = queue.Queue()
        self.stores = 0
        self.hits = 0
        self.evictions = 0
        self.write_errors = 0
        self._writer = threading.Thread(target=self._write_loop,
                                        daemon=True)
        self._writer.start()

    def _path(self, h: BlockHash) -> str:
        import os
        return os.path.join(self.dir, h.hex() + ".npz")

    def _write_loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            h, entry = item
            try:
                self._write_one(h, entry)
            except Exception:  # disk full / perms: tier degrades, the
                self.write_errors += 1  # pool above keeps serving
                with self._lock:
                    self._inflight.pop(h, None)
            self._q.task_done()

    def _write_one(self, h: BlockHash, entry: tuple) -> None:
        import os
        data, scales = entry
        arrays = {"data": data}
        if scales is not None:
            arrays["scales"] = scales
        tmp = self._path(h) + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, self._path(h))
        size = os.path.getsize(self._path(h))
        evicted: list[BlockHash] = []
        with self._lock:
            self._inflight.pop(h, None)
            if h in self._index:
                self._bytes -= self._index.pop(h)
            self._index[h] = size
            self._bytes += size
            while self._bytes > self.max_bytes and len(self._index) > 1:
                old, sz = next(iter(self._index.items()))
                if old == h:
                    break
                self._index.pop(old)
                self._bytes -= sz
                self.evictions += 1
                evicted.append(old)
        # Unlink OUTSIDE the lock: the serving thread's get()/put()
        # must not wait on an eviction sweep's disk I/O.
        for old in evicted:
            try:
                os.remove(self._path(old))
            except OSError:
                pass

    def put(self, h: BlockHash, data: np.ndarray,
            scales: Optional[np.ndarray]) -> None:
        with self._lock:
            if h in self._index or h in self._inflight:
                return
            self._inflight[h] = (data, scales)
        self.stores += 1
        self._q.put((h, (data, scales)))

    def get(self, h: BlockHash) -> Optional[tuple]:
        with self._lock:
            entry = self._inflight.get(h)
            if entry is not None:
                self.hits += 1
                return entry
            known = h in self._index
            if known:  # refresh LRU
                self._index[h] = self._index.pop(h)
        if not known:
            return None
        try:
            with np.load(self._path(h)) as z:
                entry = (z["data"], z["scales"] if "scales" in z
                         else None)
        except OSError:
            with self._lock:
                sz = self._index.pop(h, 0)
                self._bytes -= sz
            return None
        self.hits += 1
        return entry

    def __contains__(self, h: BlockHash) -> bool:
        with self._lock:
            return h in self._index or h in self._inflight

    def flush(self) -> None:
        """Block until all queued writes are on disk (tests/shutdown)."""
        self._q.join()

    @property
    def num_blocks(self) -> int:
        with self._lock:
            return len(self._index) + len(self._inflight)


class TieredHostKVPool(HostKVPool):
    """RAM tier backed by a spill tier (fs/object store).

    Ref analog: OffloadingManager with a tiering backend
    (vllm/v1/kv_offload/tiering/): RAM evictions demote down, tier
    hits promote back up. Same interface as HostKVPool, so the
    scheduler/runner wiring is unchanged.
    """

    def __init__(self, max_bytes: int, tier: FileKVTier) -> None:
        super().__init__(max_bytes)
        self.tier = tier
        self.demotions = 0
        self.promotions = 0

    def _evict_oldest(self) -> None:
        oldest = next(iter(self._entries))
        entry = self._entries[oldest]
        self.tier.put(oldest, entry[0], entry[1])
        self.demotions += 1
        super()._evict_oldest()

    def get(self, h: BlockHash) -> Optional[tuple]:
        entry = super().get(h)
        if entry is None:
            entry = self.tier.get(h)
            if entry is not None:
                self.promotions += 1
                # Promote into RAM (may demote colder entries).
                self.store(h, entry[0], entry[1])
        return entry

    def __contains__(self, h: BlockHash) -> bool:
        return super().__contains__(h) or h in self.tier


class ObjectKVServer:
    """Standalone content-addressed KV blob store (ref analog: the
    obj backend under vllm/v1/kv_offload/tiering/ + the lmcache-class
    shared-storage connectors): a ZMQ REP service holding immutable
    per-block-hash blobs so MULTIPLE engines share prefix KV —
    engine A's evictions become engine B's prefix hits.

    Wire (multipart): [op, hash, payload?]
        PUT  h npz  -> b"ok"
        GET  h      -> npz | b""               (miss)
        HAS  h      -> b"1" | b"0"
        STAT        -> json {blocks, bytes, hits, stores}
    Blobs are LRU-bounded by ``max_bytes`` (in memory; an on-disk
    object root is the FileKVTier below a server-local pool)."""

    def __init__(self, bind: str, max_bytes: int = 4 * 2**30) -> None:
        import threading

        import zmq
        self.max_bytes = max_bytes
        self._blobs: dict[bytes, bytes] = {}
        self._bytes = 0
        self.hits = 0
        self.stores = 0
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        self._sock.bind(bind)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        import json as _json

        import zmq
        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(timeout=100)):
                continue
            try:
                frames = self._sock.recv_multipart()
                op = frames[0]
                if op == b"PUT":
                    h, blob = frames[1], frames[2]
                    if h not in self._blobs:
                        self._blobs[h] = blob
                        self._bytes += len(blob)
                        self.stores += 1
                        while (self._bytes > self.max_bytes
                               and len(self._blobs) > 1):
                            old, ob = next(iter(self._blobs.items()))
                            if old == h:
                                break
                            self._blobs.pop(old)
                            self._bytes -= len(ob)
                    self._sock.send(b"ok")
                elif op == b"GET":
                    blob = self._blobs.get(frames[1])
                    if blob is not None:
                        self.hits += 1
                        # refresh LRU
                        self._blobs[frames[1]] = self._blobs.pop(
                            frames[1])
                    self._sock.send(blob or b"")
                elif op == b"HAS":
                    self._sock.send(
                        b"1" if frames[1] in self._blobs else b"0")
                elif op == b"STAT":
                    self._sock.send(_json.dumps({
                        "blocks": len(self._blobs),
                        "bytes": self._bytes,
                        "hits": self.hits,
                        "stores": self.stores,
                    }).encode())
                else:
                    self._sock.send(b"")
            except Exception:
                if self._stop.is_set():
                    return
                logger.exception("object-store request failed")

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=1.0)
        self._sock.close(0)


class ObjectKVTier:
    """Client tier speaking to an ObjectKVServer — the FileKVTier
    interface with put/get re-pointed at the shared store (put stays
    async write-behind; get/contains are REQ round trips with a
    timeout, so a dead store degrades to misses instead of stalling
    the serving loop)."""

    def __init__(self, addr: str, timeout_ms: int = 200) -> None:
        import io
        import queue
        import threading

        import zmq
        self.addr = addr
        self.timeout_ms = timeout_ms
        self._ctx = zmq.Context.instance()
        self._lock = threading.Lock()  # REQ sockets are not reentrant
        self._sock = self._new_sock()
        self._inflight: dict[BlockHash, tuple] = {}
        self._known: set[BlockHash] = set()
        self._q: "queue.Queue" = queue.Queue()
        self.stores = 0
        self.hits = 0
        self.write_errors = 0
        self._io = io
        self._writer = threading.Thread(target=self._write_loop,
                                        daemon=True)
        self._writer.start()

    def _new_sock(self):
        import zmq
        s = self._ctx.socket(zmq.REQ)
        s.setsockopt(zmq.LINGER, 0)
        s.setsockopt(zmq.RCVTIMEO, self.timeout_ms)
        s.setsockopt(zmq.SNDTIMEO, self.timeout_ms)
        s.connect(self.addr)
        return s

    def _rpc(self, *frames) -> Optional[bytes]:
        import zmq
        with self._lock:
            try:
                self._sock.send_multipart(list(frames))
                return self._sock.recv()
            except zmq.Again:
                # REQ is now poisoned (strict alternation): rebuild.
                self._sock.close(0)
                self._sock = self._new_sock()
                return None

    @staticmethod
    def _pack(entry: tuple) -> bytes:
        import io
        data, scales = entry
        buf = io.BytesIO()
        arrays = {"data": data}
        if scales is not None:
            arrays["scales"] = scales
        np.savez(buf, **arrays)
        return buf.getvalue()

    @staticmethod
    def _unpack(blob: bytes) -> tuple:
        import io
        with np.load(io.BytesIO(blob)) as z:
            return (z["data"], z["scales"] if "scales" in z else None)

    def _write_loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            h, entry = item
            ok = self._rpc(b"PUT", h, self._pack(entry))
            if ok is None:
                self.write_errors += 1
            else:
                self._known.add(h)
            with self._lock:
                pass
            self._inflight.pop(h, None)
            self._q.task_done()

    def put(self, h: BlockHash, data: np.ndarray,
            scales: Optional[np.ndarray]) -> None:
        if h in self._known or h in self._inflight:
            return
        self._inflight[h] = (data, scales)
        self.stores += 1
        self._q.put((h, (data, scales)))

    def get(self, h: BlockHash) -> Optional[tuple]:
        entry = self._inflight.get(h)
        if entry is not None:
            self.hits += 1
            return entry
        blob = self._rpc(b"GET", h)
        if not blob:
            return None
        self.hits += 1
        self._known.add(h)
        try:
            return self._unpack(blob)
        except Exception:
            return None

    def __contains__(self, h: BlockHash) -> bool:
        if h in self._known or h in self._inflight:
            return True
        return self._rpc(b"HAS", h) == b"1"

    def flush(self) -> None:
        self._q.join()

    @property
    def num_blocks(self) -> int:
        return len(self._known) + len(self._inflight)
