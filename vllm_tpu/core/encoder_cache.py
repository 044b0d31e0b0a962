"""Scheduler-side encoder cache: budgeted reuse of vision embeddings.

Ref analog: vllm/v1/core/encoder_cache_manager.py:1-385
(EncoderCacheManager) — multimodal encoder outputs are cached under a
token budget, keyed by content hash, so requests sharing an image run
the vision tower once; the scheduler defers admission when the budget
cannot hold a request's new encoder inputs.

Split of responsibilities (mirrors the reference):
- this manager (scheduler side) does pure bookkeeping: which item
  hashes are cached, reference counts from live requests, LRU over
  unreferenced entries, token budget;
- the runner holds the actual embedding arrays in an ``encoder_store``
  keyed by the same hashes, encoding only the miss list the scheduler
  sends and dropping entries the scheduler evicts (SchedulerOutput
  ``mm_encode_hashes`` / ``encoder_evict``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EncoderAlloc:
    """Result of an admission-time allocation."""
    # Items the runner must encode this step (cache misses), in request
    # item order.
    miss_hashes: list[str] = field(default_factory=list)
    # Entries the runner must drop to make room (evicted zero-ref LRU).
    evict_hashes: list[str] = field(default_factory=list)


class EncoderCacheManager:

    def __init__(self, budget_tokens: int) -> None:
        self.budget = budget_tokens
        # hash -> token size of the cached embedding
        self.entry_tokens: dict[str, int] = {}
        # hash -> number of live requests referencing it
        self.refs: dict[str, int] = {}
        # insertion-ordered dict as LRU over zero-ref entries
        self._freeable: dict[str, None] = {}
        self.used = 0
        # per-request view for freeing
        self._req_items: dict[str, list[str]] = {}
        # observability
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def try_allocate(self, req_id: str, item_hashes: list[str],
                     item_tokens: list[int]) -> EncoderAlloc | None:
        """Reserve cache space for a request's items.  Returns None
        when the new items cannot fit the budget even after evicting
        every unreferenced entry — the caller leaves the request
        waiting (ref: scheduler encoder budget deferral)."""
        assert req_id not in self._req_items, req_id
        need = 0
        seen: dict[str, int] = {}
        for h, t in zip(item_hashes, item_tokens):
            if h not in self.entry_tokens and h not in seen:
                need += t
                seen[h] = t
        freeable_tokens = sum(self.entry_tokens[h] for h in self._freeable)
        if self.used + need - freeable_tokens > self.budget:
            return None

        alloc = EncoderAlloc()
        # Evict zero-ref LRU entries until the new items fit.
        while self.used + need > self.budget:
            victim, _ = next(iter(self._freeable.items()))
            del self._freeable[victim]
            self.used -= self.entry_tokens.pop(victim)
            self.refs.pop(victim, None)
            alloc.evict_hashes.append(victim)
            self.evictions += 1

        for h, t in zip(item_hashes, item_tokens):
            if h in self.entry_tokens:
                if self.refs.get(h, 0) == 0:
                    self._freeable.pop(h, None)
                if h not in alloc.miss_hashes:
                    self.hits += 1
            else:
                self.entry_tokens[h] = t
                self.used += t
                alloc.miss_hashes.append(h)
                self.misses += 1
            self.refs[h] = self.refs.get(h, 0) + 1
        self._req_items[req_id] = list(item_hashes)
        return alloc

    def free_request(self, req_id: str) -> None:
        """Drop the request's references; zero-ref entries stay cached
        (prefix-cache-style reuse) until the budget evicts them."""
        for h in self._req_items.pop(req_id, []):
            n = self.refs.get(h, 0) - 1
            if n <= 0:
                self.refs.pop(h, None)
                if h in self.entry_tokens:
                    self._freeable[h] = None  # LRU tail
            else:
                self.refs[h] = n

    def has_request(self, req_id: str) -> bool:
        return req_id in self._req_items

    def reset(self) -> list[str]:
        """Drop everything (fault re-init); returns hashes to evict."""
        evict = list(self.entry_tokens)
        self.entry_tokens.clear()
        self.refs.clear()
        self._freeable.clear()
        self._req_items.clear()
        self.used = 0
        return evict
