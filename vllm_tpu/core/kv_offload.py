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
            oldest = next(iter(self._entries))
            self._bytes -= self._nbytes(self._entries.pop(oldest))
            self.evictions += 1
        if need <= self.max_bytes:
            self._entries[h] = entry
            self._bytes += need

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
