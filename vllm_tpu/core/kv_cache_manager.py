"""Per-request paged-KV allocation on top of BlockPool.

Behavioral parity with the reference KVCacheManager (ref:
vllm/v1/core/kv_cache_manager.py ``KVCacheManager:117``,
``get_computed_blocks():229``, ``allocate_slots():344``) for the
full-attention single-group case (sliding-window/hybrid groups arrive
with the models that need them).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from vllm_tpu.core.block_pool import (BlockHash, BlockPool, KVCacheBlock,
                                      hash_block_tokens)
from vllm_tpu.core.request import Request
from vllm_tpu.utils import cdiv


@dataclass
class KVCacheBlocks:
    """Result wrapper so callers never touch raw block objects."""
    blocks: list[KVCacheBlock]

    def get_block_ids(self) -> list[int]:
        return [b.block_id for b in self.blocks]

    def __add__(self, other: "KVCacheBlocks") -> "KVCacheBlocks":
        return KVCacheBlocks(self.blocks + other.blocks)

    def __len__(self) -> int:
        return len(self.blocks)


class KVCacheManager:

    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_caching: bool = True,
        hash_algo: str = "builtin",
        sliding_window: Optional[int] = None,
        cp: int = 1,
    ) -> None:
        self.block_size = block_size
        self.enable_caching = enable_caching
        self.hash_algo = hash_algo
        self.sliding_window = sliding_window
        # Context parallelism: the cache array's block axis is GSPMD-
        # sharded over ``cp``, and token chunk j must land on rank
        # j % cp (parallel/context.py layout). One pool per rank
        # partition enforces that placement; chunk j's block is drawn
        # from partition j % cp and carries a *global* id in
        # [r * blocks_local, (r+1) * blocks_local). Ref analog: the
        # dcp_world_size accounting in the reference scheduler
        # (vllm/v1/core/sched/scheduler.py:175).
        self.cp = cp
        import os
        if cp > 1:
            assert num_blocks % cp == 0, (num_blocks, cp)
            self.blocks_local = num_blocks // cp
            self.pools = [
                BlockPool(self.blocks_local, enable_caching,
                          id_offset=r * self.blocks_local)
                for r in range(cp)
            ]
            self.block_pool = self.pools[0]
        elif __import__("vllm_tpu.envs", fromlist=["envs"]).VLLM_TPU_NATIVE_POOL:
            # Native (C++) pool: same semantics, no per-op Python cost
            # (csrc/block_pool.cc; parity suite guards equivalence).
            from vllm_tpu.core.native_pool import (NativeBlockPool,
                                                   native_pool_available)
            if native_pool_available():
                self.block_pool = NativeBlockPool(num_blocks,
                                                  enable_caching)
            else:
                self.block_pool = BlockPool(num_blocks, enable_caching)
            self.blocks_local = num_blocks
            self.pools = [self.block_pool]
        else:
            self.block_pool = BlockPool(num_blocks, enable_caching)
            self.blocks_local = num_blocks
            self.pools = [self.block_pool]
        # Per-request count of leading blocks already swapped for the
        # null block (sliding window; ref analog: SlidingWindowManager
        # remove_skipped_blocks, v1/core/single_type_kv_cache_manager.py).
        self._num_nulled: dict[str, int] = {}
        # request_id -> blocks owned by that request (ordered).
        self.req_to_blocks: dict[str, list[KVCacheBlock]] = {}
        # request_id -> chained hashes of its full blocks (cached
        # incrementally; hash i covers tokens [0, (i+1)*block_size)).
        self.req_to_block_hashes: dict[str, list[BlockHash]] = {}
        # number of this request's blocks already registered in the
        # prefix cache.
        self.num_cached_blocks: dict[str, int] = {}

    # -- cp partition routing -----------------------------------------
    def _pool_of_chunk(self, chunk_idx: int) -> BlockPool:
        return self.pools[chunk_idx % self.cp]

    def _pool_of_block(self, block: KVCacheBlock) -> BlockPool:
        return self.pools[block.block_id // self.blocks_local]

    def _null_of_chunk(self, chunk_idx: int) -> KVCacheBlock:
        return self._pool_of_chunk(chunk_idx).null_block

    def _is_null(self, block: KVCacheBlock) -> bool:
        return any(block is p.null_block for p in self.pools)

    def _free_routed(self, blocks: list[KVCacheBlock]) -> None:
        """free_blocks with per-partition routing, preserving the
        caller's eviction-priority order within each partition."""
        if self.cp == 1:
            self.block_pool.free_blocks(blocks)
            return
        per: list[list[KVCacheBlock]] = [[] for _ in self.pools]
        for b in blocks:
            if self._is_null(b):
                continue
            per[b.block_id // self.blocks_local].append(b)
        for pool, bs in zip(self.pools, per):
            pool.free_blocks(bs)

    # -- hashing -----------------------------------------------------
    def _update_block_hashes(self, request: Request) -> list[BlockHash]:
        """Extend the request's hash chain over all *full* blocks."""
        hashes = self.req_to_block_hashes.setdefault(request.request_id, [])
        tokens = request.all_token_ids
        num_full = len(tokens) // self.block_size
        # Anything that changes KV content for identical token ids
        # rides the hash: LoRA adapter, multimodal inputs (ref analog:
        # mm hashing in kv_cache_utils block hashing).
        extra_parts = []
        if request.lora_name:
            extra_parts.append(request.lora_name)
        if getattr(request, "mm_hash", None):
            extra_parts.append(request.mm_hash)
        extra = tuple(extra_parts) if extra_parts else None
        if self.hash_algo == "fnv" and len(hashes) < num_full:
            # Batch path: the whole new-block span hashes in one
            # native call (csrc/block_hash.cc) — the per-admission
            # hot path for long prompts.
            from vllm_tpu.core.block_pool import (_extra_blob,
                                                  chain_hashes_fnv)
            start = len(hashes)
            hashes.extend(chain_hashes_fnv(
                hashes[-1] if hashes else None,
                tokens[start * self.block_size:num_full *
                       self.block_size], self.block_size,
                _extra_blob(extra)))
            return hashes
        while len(hashes) < num_full:
            i = len(hashes)
            parent = hashes[-1] if hashes else None
            chunk = tuple(tokens[i * self.block_size:(i + 1) *
                                 self.block_size])
            hashes.append(
                hash_block_tokens(parent, chunk, extra, self.hash_algo))
        return hashes

    # -- scheduler API ----------------------------------------------
    def get_computed_blocks(
            self, request: Request) -> tuple[KVCacheBlocks, int]:
        """Longest cached prefix for a new/resumed request.

        Returns blocks (not yet ref'd — allocate_slots takes the refs)
        and the number of computed tokens they cover. Never returns the
        whole prompt: at least one token must run through the model so
        it produces logits (same truncation as ref
        kv_cache_manager.py get_computed_blocks).
        """
        if not self.enable_caching or request.num_computed_tokens > 0:
            return KVCacheBlocks([]), 0
        hashes = self._update_block_hashes(request)
        # Only prompt blocks are eligible (a fresh request has no output).
        max_cache_hit_tokens = request.num_tokens - 1
        blocks: list[KVCacheBlock] = []
        # Stats are counted in blocks (both queries and hits), matching
        # the reference's PrefixCacheStats semantics.
        num_eligible = min(len(hashes),
                           max_cache_hit_tokens // self.block_size)
        self.block_pool.stats.queries += num_eligible
        for i, h in enumerate(hashes):
            if (i + 1) * self.block_size > max_cache_hit_tokens:
                break
            block = self._pool_of_chunk(i).get_cached_block(h)
            if block is None:
                break
            blocks.append(block)
        self.block_pool.stats.hits += len(blocks)
        return KVCacheBlocks(blocks), len(blocks) * self.block_size

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        new_computed_blocks: Optional[KVCacheBlocks] = None,
        num_lookahead_tokens: int = 0,
    ) -> Optional[KVCacheBlocks]:
        """Ensure the request owns blocks for its next ``num_new_tokens``
        (+ speculative lookahead). Returns the newly allocated blocks,
        or None if the pool can't satisfy the demand (caller preempts).
        """
        assert num_new_tokens > 0
        new_computed = new_computed_blocks.blocks if new_computed_blocks else []
        req_blocks = self.req_to_blocks.setdefault(request.request_id, [])
        self._free_out_of_window(request, req_blocks)

        num_computed_tokens = (request.num_computed_tokens +
                               len(new_computed) * self.block_size)
        total_tokens = (num_computed_tokens + num_new_tokens +
                        num_lookahead_tokens)
        num_required_blocks = cdiv(total_tokens, self.block_size)
        num_new_blocks = (num_required_blocks - len(req_blocks) -
                          len(new_computed))
        start_chunk = len(req_blocks) + len(new_computed)

        # Availability check: freshly touched computed blocks with
        # ref 0 would come out of the free pool too. Per partition
        # under cp (demand at chunk start_chunk + k hits partition
        # (start_chunk + k) % cp).
        demand = [0] * self.cp
        for k in range(max(num_new_blocks, 0)):
            demand[(start_chunk + k) % self.cp] += 1
        evictable = [0] * self.cp
        for b in new_computed:
            if b.ref_cnt == 0:
                evictable[b.block_id // self.blocks_local] += 1
        if any(d > p.num_free_blocks - e
               for d, p, e in zip(demand, self.pools, evictable)):
            return None

        # Take refs on the prefix-hit blocks and append them.
        if new_computed:
            if self.cp == 1:
                self.block_pool.touch(new_computed)
            else:
                for b in new_computed:
                    self._pool_of_block(b).touch([b])
            req_blocks.extend(new_computed)
            self.num_cached_blocks[request.request_id] = (
                self.num_cached_blocks.get(request.request_id, 0) +
                len(new_computed))

        new_blocks: list[KVCacheBlock] = []
        if num_new_blocks > 0:
            if self.cp == 1:
                new_blocks = self.block_pool.get_new_blocks(num_new_blocks)
            else:
                new_blocks = [
                    self._pool_of_chunk(start_chunk +
                                        k).get_new_blocks(1)[0]
                    for k in range(num_new_blocks)
                ]
            req_blocks.extend(new_blocks)

        # Register hashes for blocks that become full this step
        # (speculative/lookahead tokens are unverified — never cached,
        # same rule as ref allocate_slots).
        if self.enable_caching:
            num_full_after = (num_computed_tokens +
                              num_new_tokens) // self.block_size
            # Cap by tokens that actually exist (lookahead excluded).
            num_full_after = min(num_full_after,
                                 request.num_tokens // self.block_size)
            hashes = self._update_block_hashes(request)
            num_cached = self.num_cached_blocks.get(request.request_id, 0)
            if num_full_after > num_cached:
                bs = self.block_size
                if self.cp == 1:
                    self.block_pool.cache_full_blocks(
                        req_blocks, hashes, num_cached, num_full_after,
                        token_ids=request.all_token_ids[num_cached * bs:
                                                    num_full_after * bs],
                        block_size=bs)
                else:
                    for i in range(num_cached, num_full_after):
                        self._pool_of_chunk(i).cache_full_blocks(
                            [req_blocks[i]], [hashes[i]], 0, 1,
                            token_ids=request.all_token_ids[i * bs:
                                                        (i + 1) * bs],
                            block_size=bs)
                self.num_cached_blocks[
                    request.request_id] = num_full_after
        return KVCacheBlocks(new_blocks)

    def _free_out_of_window(self, request: Request,
                            req_blocks: list[KVCacheBlock]) -> None:
        """Sliding window: blocks whose every token sits below the
        attention window of ALL future queries are swapped for the null
        block and returned to the pool — bounded KV for long
        generations (ref: SlidingWindowSpec kv_cache_interface.py:559,
        SlidingWindowManager.remove_skipped_blocks). The decode kernel
        independently skips those blocks (first_blk), and prefill masks
        them, so stale worker block-table entries are never *used*."""
        if self.sliding_window is None:
            return
        # Earliest kv position any future query (pos >= computed) can
        # attend: computed - window + 1. Blocks fully below are dead.
        boundary = request.num_computed_tokens - self.sliding_window + 1
        n_dead = min(boundary // self.block_size, len(req_blocks))
        start = self._num_nulled.get(request.request_id, 0)
        if n_dead <= start:
            return
        dead = [b for b in req_blocks[start:n_dead]
                if not self._is_null(b)]
        for i in range(start, n_dead):
            # Under cp the null must sit in chunk i's partition so the
            # (masked) placeholder stays a local row on rank i % cp.
            req_blocks[i] = self._null_of_chunk(i)
        self._free_routed(list(reversed(dead)))
        self._num_nulled[request.request_id] = n_dead

    def free(self, request: Request) -> None:
        """Release all blocks. Reverse order => sequence tails evict
        before shared prefixes."""
        blocks = self.req_to_blocks.pop(request.request_id, [])
        self.num_cached_blocks.pop(request.request_id, None)
        self._num_nulled.pop(request.request_id, None)
        self._free_routed(list(reversed(blocks)))

    def free_block_hashes(self, request: Request) -> None:
        self.req_to_block_hashes.pop(request.request_id, None)

    def get_block_ids(self, request_id: str) -> list[int]:
        return [b.block_id for b in self.req_to_blocks.get(request_id, [])]

    @property
    def usage(self) -> float:
        if self.cp == 1:
            return self.block_pool.usage
        return sum(p.usage for p in self.pools) / self.cp

    def reset_prefix_cache(self) -> bool:
        return all([p.reset_prefix_cache() for p in self.pools])
