"""ctypes binding for the native block pool (csrc/block_pool.cc).

Drop-in for core/block_pool.BlockPool behind the same method surface
the KVCacheManager uses. Selected via VLLM_TPU_NATIVE_POOL=1 (falls
back to the Python pool if the toolchain is unavailable). Hashes are
folded to 64-bit on the boundary; the eviction hook drains a ring
instead of calling back per block.
"""

from __future__ import annotations

import ctypes as C
from typing import Optional

import numpy as np

from vllm_tpu.core.block_pool import (BlockHash, KVCacheBlock,
                                      PrefixCacheStats)


def _fold(h: BlockHash) -> int:
    """bytes hash -> u64 (collision tier == the builtin-hash mode)."""
    return int.from_bytes(h[:8].ljust(8, b"\0"), "little")


def native_pool_available() -> bool:
    from vllm_tpu.csrc import load
    return load("block_pool") is not None


class NativeBlockPool:
    """Python-object view over the C++ pool.

    KVCacheBlock objects are materialized per block id (stable list, no
    churn) so KVCacheManager's block-object bookkeeping is unchanged;
    ref counts live in C++ and are mirrored on access only where the
    manager reads them (ref_cnt for availability checks).
    """

    def __init__(self, num_blocks: int, enable_caching: bool = True) -> None:
        from vllm_tpu.csrc import load
        lib = load("block_pool")
        assert lib is not None, "native pool unavailable"
        self._lib = lib
        lib.bp_create.restype = C.c_void_p
        lib.bp_hash_block.restype = C.c_uint64
        self._p = C.c_void_p(lib.bp_create(num_blocks, int(enable_caching)))
        assert self._p, "bp_create failed"
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.blocks = [KVCacheBlock(i) for i in range(num_blocks)]
        self.null_block = self.blocks[0]
        self.null_block.ref_cnt = 1
        self.stats = PrefixCacheStats()
        self._h64_to_bytes: dict[int, BlockHash] = {}
        self.on_evict = None
        # KV event sink (engine/kv_events.py; ref kv_events.py:50-245)
        self.events = None

    def __del__(self) -> None:  # noqa: D105
        if getattr(self, "_p", None):
            self._lib.bp_destroy(self._p)
            self._p = None

    # -- queries -----------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return self._lib.bp_num_free(self._p)

    @property
    def num_cached_blocks(self) -> int:
        return self._lib.bp_cache_size(self._p)

    def get_cached_block(self, h: BlockHash) -> Optional[KVCacheBlock]:
        # NOTE: stats are the caller's job (KVCacheManager counts
        # queries/hits itself, same contract as the Python pool).
        bid = self._lib.bp_get_cached_block(self._p, C.c_uint64(_fold(h)))
        if bid < 0:
            return None
        blk = self.blocks[bid]
        blk.block_hash = h
        return blk

    # -- allocation --------------------------------------------------
    def get_new_blocks(self, num: int) -> list[KVCacheBlock]:
        out = (C.c_int32 * max(num, 1))()
        rc = self._lib.bp_get_new_blocks(self._p, num, out)
        if rc != 0:
            raise RuntimeError(
                f"cannot allocate {num} blocks "
                f"({self.num_free_blocks} free)")
        self._drain_evictions()
        res = []
        for i in range(num):
            b = self.blocks[out[i]]
            b.ref_cnt = 1
            b.block_hash = None
            res.append(b)
        return res

    def _drain_evictions(self) -> None:
        buf = (C.c_uint64 * 256)()
        while True:
            n = self._lib.bp_drain_evictions(self._p, buf, 128)
            for i in range(n):
                bid = int(buf[2 * i])
                h64 = int(buf[2 * i + 1])
                self.stats.evictions += 1
                h = self._h64_to_bytes.get(h64)
                if self.on_evict is not None and h is not None:
                    self.on_evict(bid, h)
                if self.events is not None and h is not None:
                    from vllm_tpu.engine.kv_events import BlockRemoved
                    self.events.emit(BlockRemoved(block_hashes=[h]))
            if n < 128:
                return

    def touch(self, blocks: list[KVCacheBlock]) -> None:
        ids = np.asarray([b.block_id for b in blocks], np.int32)
        self._lib.bp_touch(self._p,
                           ids.ctypes.data_as(C.POINTER(C.c_int32)),
                           len(blocks))
        for b in blocks:
            b.ref_cnt += 1

    def free_blocks(self, blocks: list[KVCacheBlock]) -> None:
        ids = np.asarray([b.block_id for b in blocks], np.int32)
        rc = self._lib.bp_free_blocks(
            self._p, ids.ctypes.data_as(C.POINTER(C.c_int32)),
            len(blocks))
        assert rc == 0, "double free (native pool)"
        for b in blocks:
            if b is not self.null_block:
                b.ref_cnt -= 1

    # -- prefix caching ----------------------------------------------
    def cache_full_blocks(self, blocks, block_hashes, num_cached_blocks,
                          num_full_blocks, token_ids=None,
                          block_size: int = 0) -> None:
        if not self.enable_caching:
            return
        n = num_full_blocks
        ids = np.asarray([b.block_id for b in blocks[:n]], np.int32)
        h64 = np.empty(n, np.uint64)
        for i in range(n):
            v = _fold(block_hashes[i])
            h64[i] = v
            self._h64_to_bytes[v] = block_hashes[i]
        self._lib.bp_cache_full_blocks(
            self._p, ids.ctypes.data_as(C.POINTER(C.c_int32)),
            h64.ctypes.data_as(C.POINTER(C.c_uint64)),
            num_cached_blocks, num_full_blocks)
        stored = []
        for i in range(num_cached_blocks, num_full_blocks):
            if blocks[i].block_hash is None:
                blocks[i].block_hash = block_hashes[i]
                stored.append(block_hashes[i])
        if stored and self.events is not None:
            from vllm_tpu.engine.kv_events import BlockStored
            parent = (block_hashes[num_cached_blocks - 1]
                      if num_cached_blocks > 0 else None)
            self.events.emit(BlockStored(
                block_hashes=stored, parent_block_hash=parent,
                token_ids=list(token_ids or []),
                block_size=block_size))

    def reset_prefix_cache(self) -> bool:
        ok = bool(self._lib.bp_reset_prefix_cache(self._p))
        if ok:
            for b in self.blocks:
                b.block_hash = None
            if self.events is not None:
                from vllm_tpu.engine.kv_events import AllBlocksCleared
                self.events.emit(AllBlocksCleared())
        return ok

    @property
    def usage(self) -> float:
        return 1.0 - self.num_free_blocks / (self.num_blocks - 1)
