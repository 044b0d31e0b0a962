"""Global KV-block pool: free list + content-addressed prefix cache.

Behavioral parity with the reference BlockPool (ref:
vllm/v1/core/block_pool.py ``BlockPool:143``, ``cache_full_blocks():225``)
with a simpler O(1) LRU: Python dicts preserve insertion order, so the
free queue is an ordered dict block_id -> block (append = insert,
pop-LRU = first key, arbitrary removal = del).

Invariants:
- a block is in the free queue iff ref_cnt == 0
- a free block may still carry a hash and stay in the prefix cache
  (lazy eviction: the hash is dropped only when the block is reallocated)
- block 0 is the null block (never allocated, never cached); keeps
  block-table padding benign on device.
"""

from __future__ import annotations

import hashlib
import pickle
from dataclasses import dataclass, field
from typing import Optional

BlockHash = bytes


def hash_block_tokens(
    parent_hash: Optional[BlockHash],
    token_ids: tuple[int, ...],
    extra_key: Optional[tuple] = None,
    algo: str = "builtin",
) -> BlockHash:
    """Chained content hash of one full block.

    h_i = H(h_{i-1}, tokens_i, extra) — the chain makes a block hash
    cover its whole prefix (ref: vllm/v1/core/kv_cache_utils.py block
    hashing). ``extra_key`` carries anything that changes KV content for
    identical tokens (e.g. LoRA name, mm hashes).
    """
    if algo == "fnv":
        return chain_hashes_fnv(parent_hash, list(token_ids),
                                len(token_ids),
                                _extra_blob(extra_key))[0]
    key = (parent_hash, token_ids, extra_key)
    if algo == "builtin":
        # Fast path for tests/dev. Collision risk accepted like the
        # reference's PYTHONHASHSEED-keyed builtin mode.
        return hash(key).to_bytes(8, "little", signed=True)
    blob = pickle.dumps(key, protocol=pickle.HIGHEST_PROTOCOL)
    return hashlib.sha256(blob).digest()


def _extra_blob(extra_key: Optional[tuple]) -> bytes:
    return repr(extra_key).encode() if extra_key else b""


_FNV_OFF = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _fnv1a(h: int, data: bytes) -> int:
    for byte in data:
        h = ((h ^ byte) * _FNV_PRIME) & _MASK64
    return h


def chain_hashes_fnv(
    parent_hash: Optional[BlockHash],
    token_ids: list[int],
    block_size: int,
    extra_blob: bytes = b"",
) -> list[BlockHash]:
    """Whole-request chained FNV-1a-64 block hashes in one pass.

    The default prefix-cache hash since r4: process-STABLE (unlike the
    salted builtin mode — fnv hashes are valid cross-process keys for
    the FileKVTier / disagg payloads) and batch-computed natively
    (csrc/block_hash.cc) when the toolchain is available; this Python
    loop is the byte-identical fallback (parity-tested)."""
    import numpy as np
    num_full = len(token_ids) // block_size
    if num_full == 0:
        return []
    toks = np.asarray(token_ids[:num_full * block_size], dtype="<i4")
    from vllm_tpu.csrc import load
    lib = load("block_hash")
    if lib is not None:
        import ctypes as Ct
        out = np.empty(num_full, np.uint64)
        p64 = int.from_bytes((parent_hash or b"")[:8].ljust(8, b"\0"),
                             "little")
        lib.fnv_chain_hashes(
            Ct.c_uint64(p64), Ct.c_int32(1 if parent_hash else 0),
            toks.ctypes.data_as(Ct.POINTER(Ct.c_int32)),
            Ct.c_int64(num_full), Ct.c_int64(block_size),
            extra_blob, Ct.c_int64(len(extra_blob)),
            out.ctypes.data_as(Ct.POINTER(Ct.c_uint64)))
        return [int(v).to_bytes(8, "little") for v in out]
    hashes: list[BlockHash] = []
    prev = parent_hash[:8] if parent_hash else None
    tok_bytes = toks.tobytes()
    bs4 = block_size * 4
    for b in range(num_full):
        h = _FNV_OFF
        if prev is not None:
            h = _fnv1a(h, prev)
        if extra_blob:
            h = _fnv1a(h, extra_blob)
        h = _fnv1a(h, tok_bytes[b * bs4:(b + 1) * bs4])
        hb = h.to_bytes(8, "little")
        hashes.append(hb)
        prev = hb
    return hashes


@dataclass
class KVCacheBlock:
    block_id: int
    ref_cnt: int = 0
    block_hash: Optional[BlockHash] = None

    def __repr__(self) -> str:
        h = self.block_hash.hex()[:8] if self.block_hash else None
        return f"Block({self.block_id}, ref={self.ref_cnt}, hash={h})"


@dataclass
class PrefixCacheStats:
    queries: int = 0
    hits: int = 0  # in blocks
    evictions: int = 0

    @property
    def hit_rate(self) -> float:
        return self.hits / self.queries if self.queries else 0.0


class BlockPool:

    def __init__(self, num_blocks: int, enable_caching: bool = True,
                 id_offset: int = 0) -> None:
        """``id_offset`` shifts all block ids: context parallelism runs
        one pool per cp-rank partition, pool r owning global ids
        [r * blocks_local, (r+1) * blocks_local) — the contiguous GSPMD
        shard of the cache array's block axis (parallel/context.py)."""
        assert num_blocks >= 2, "need >= 2 blocks (one is the null block)"
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.blocks = [KVCacheBlock(id_offset + i)
                       for i in range(num_blocks)]
        # Null block: permanently ref'd, id 0.
        self.null_block = self.blocks[0]
        self.null_block.ref_cnt = 1
        # LRU free queue (insertion-ordered dict as O(1) deque+set).
        self._free: dict[int, KVCacheBlock] = {
            b.block_id: b for b in self.blocks[1:]
        }
        # Content-addressed cache: hash -> block. The reference keys
        # {hash: {block_id: block}} to tolerate duplicate-content blocks;
        # we keep one canonical block per hash (duplicates just don't
        # get cached — same behavior the ref converges to after dedup).
        self._cache: dict[BlockHash, KVCacheBlock] = {}
        self.stats = PrefixCacheStats()
        # KV-offload hook: called as on_evict(block_id, hash) when a
        # cached block's content is about to be dropped (reallocation).
        # The block's device data is still intact at call time.
        self.on_evict = None
        # KV event sink (engine/kv_events.py KVEventSink): BlockStored/
        # BlockRemoved/AllBlocksCleared for external prefix-aware
        # routers (ref: vllm/distributed/kv_events.py:50-245).
        self.events = None

    # -- queries -----------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return len(self._free)

    @property
    def num_cached_blocks(self) -> int:
        return len(self._cache)

    def get_cached_block(self, h: BlockHash) -> Optional[KVCacheBlock]:
        return self._cache.get(h)

    # -- allocation --------------------------------------------------
    def get_new_blocks(self, num: int) -> list[KVCacheBlock]:
        """Pop ``num`` LRU free blocks; evicts their cache entries."""
        if num > len(self._free):
            raise RuntimeError(
                f"cannot allocate {num} blocks ({len(self._free)} free)")
        out = []
        it = iter(self._free)
        ids = [next(it) for _ in range(num)]
        for bid in ids:
            block = self._free.pop(bid)
            self._maybe_evict(block)
            block.ref_cnt = 1
            out.append(block)
        return out

    def _maybe_evict(self, block: KVCacheBlock) -> None:
        h = block.block_hash
        if h is not None:
            cur = self._cache.get(h)
            if cur is block:
                del self._cache[h]
                self.stats.evictions += 1
                if self.on_evict is not None:
                    self.on_evict(block.block_id, h)
                if self.events is not None:
                    from vllm_tpu.engine.kv_events import BlockRemoved
                    self.events.emit(BlockRemoved(block_hashes=[h]))
            block.block_hash = None

    def touch(self, blocks: list[KVCacheBlock]) -> None:
        """Take a reference on cached blocks (prefix-cache hit path)."""
        for b in blocks:
            if b.ref_cnt == 0:
                del self._free[b.block_id]
            b.ref_cnt += 1

    def free_blocks(self, blocks: list[KVCacheBlock]) -> None:
        """Drop a reference; ref==0 blocks go to the free-queue tail.

        Caller passes blocks in eviction-priority order (the KV manager
        frees a request's blocks in *reverse* order so that the tail of
        a sequence — least likely to be a shared prefix — evicts first,
        matching ref kv_cache_manager free ordering).
        """
        for b in blocks:
            if b is self.null_block:
                continue
            assert b.ref_cnt > 0, f"double free of {b}"
            b.ref_cnt -= 1
            if b.ref_cnt == 0:
                self._free[b.block_id] = b

    # -- prefix caching ----------------------------------------------
    def cache_full_blocks(
        self,
        blocks: list[KVCacheBlock],
        block_hashes: list[BlockHash],
        num_cached_blocks: int,
        num_full_blocks: int,
        token_ids: Optional[list[int]] = None,
        block_size: int = 0,
    ) -> None:
        """Register hashes for blocks [num_cached, num_full) of a
        request. ``token_ids``/``block_size`` (tokens covering the
        newly cached span) feed the BlockStored event when a KV event
        sink is attached."""
        if not self.enable_caching:
            return
        assert num_full_blocks <= len(block_hashes)
        stored: list[BlockHash] = []
        for i in range(num_cached_blocks, num_full_blocks):
            block, h = blocks[i], block_hashes[i]
            if block.block_hash is not None:
                continue  # already cached (shared prefix)
            if h in self._cache:
                continue  # another block already canonical for this content
            block.block_hash = h
            self._cache[h] = block
            stored.append(h)
        if stored and self.events is not None:
            from vllm_tpu.engine.kv_events import BlockStored
            parent = (block_hashes[num_cached_blocks - 1]
                      if num_cached_blocks > 0 else None)
            self.events.emit(BlockStored(
                block_hashes=stored, parent_block_hash=parent,
                token_ids=list(token_ids or []),
                block_size=block_size))

    def reset_prefix_cache(self) -> bool:
        """Drop all cache entries; fails if any block is in use."""
        in_use = self.num_blocks - 1 - len(self._free)
        if in_use > 0:
            return False
        for b in self._free.values():
            b.block_hash = None
        self._cache.clear()
        if self.events is not None:
            from vllm_tpu.engine.kv_events import AllBlocksCleared
            self.events.emit(AllBlocksCleared())
        return True

    @property
    def usage(self) -> float:
        return 1.0 - len(self._free) / (self.num_blocks - 1)
