"""Suffix decoding: tree-based speculation over previously seen text
(arXiv 2411.04975 — "SuffixDecoding").

Ref analog: vllm/v1/spec_decode/suffix_decoding.py
(SuffixDecodingProposer:9), which delegates to Arctic Inference's
SuffixDecodingCache. This module is a from-scratch implementation of
the same contract:

- a per-request **prompt tree** holding every (depth-bounded) suffix of
  the request's prompt, and
- a **global response tree** accumulating the generated outputs of past
  and active requests (bounded by ``max_cached_requests``, FIFO evict),

both depth-bounded tries with per-node frequency counts. Speculation
matches the longest trailing pattern of the current sequence against
both trees and greedily walks the most-frequent children, emitting a
dynamic-length draft gated by ``max_spec_factor`` (draft length ≤
factor × match length) and ``min_token_prob`` (empirical child
frequency). Pure host logic, zero device cost — like ngram but with
cross-request reuse and frequency-weighted continuation.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

from vllm_tpu.config import SpeculativeConfig


@dataclass
class _Node:
    count: int = 0
    children: dict[int, "_Node"] = field(default_factory=dict)


class _Tree:
    """Depth-bounded suffix trie with frequency counts."""

    def __init__(self, max_depth: int) -> None:
        self.root = _Node()
        self.max_depth = max_depth

    def add_suffixes_ending_at(self, seq: list[int], end: int) -> None:
        """Insert/extend every suffix of ``seq[:end+1]`` that ends at
        index ``end`` (the incremental step for one appended token)."""
        lo = max(0, end - self.max_depth + 1)
        for start in range(lo, end + 1):
            node = self.root
            for tok in seq[start:end + 1]:
                nxt = node.children.get(tok)
                if nxt is None:
                    nxt = node.children[tok] = _Node()
                node = nxt
            node.count += 1

    def add_sequence(self, seq: list[int]) -> None:
        for end in range(len(seq)):
            self.add_suffixes_ending_at(seq, end)

    def remove_sequence(self, seq: list[int]) -> None:
        """Exact inverse of add_sequence (eviction support)."""
        for end in range(len(seq)):
            lo = max(0, end - self.max_depth + 1)
            for start in range(lo, end + 1):
                node = self.root
                path = []
                for tok in seq[start:end + 1]:
                    path.append((node, tok))
                    node = node.children[tok]
                node.count -= 1
                # Prune empty leaves bottom-up.
                for parent, tok in reversed(path):
                    child = parent.children[tok]
                    if child.count <= 0 and not child.children:
                        del parent.children[tok]
                    else:
                        break

    def matches(self, pattern: list[int]):
        """Yield (node, match_len) for every suffix of ``pattern`` that
        is a path from the root, longest first. The longest match often
        ends where the corpus ends (no continuation yet), so callers
        score the walk from each match rather than taking the first."""
        max_len = min(len(pattern), self.max_depth - 1)
        for n in range(max_len, 0, -1):
            node = self.root
            for tok in pattern[-n:]:
                node = node.children.get(tok)
                if node is None:
                    break
            else:
                yield node, n


def _greedy_walk(node: _Node, limit: int,
                 min_token_prob: float) -> list[int]:
    """Follow the most-frequent child chain. Every n-gram occurrence
    increments exactly its end node, so ``node.count`` IS the n-gram's
    occurrence count and the empirical continuation probability is
    count(context + t) / count(context)."""
    draft: list[int] = []
    while node.children and len(draft) < limit:
        tok, child = max(node.children.items(),
                         key=lambda kv: kv[1].count)
        if node.count <= 0 or child.count / node.count < min_token_prob:
            break
        draft.append(tok)
        node = child
    return draft


class SuffixDecodingCache:
    """Own-implementation analog of Arctic Inference's
    SuffixDecodingCache (the object vllm's SuffixDecodingProposer
    drives: start_request / add_active_response / speculate /
    stop_request / evict_cached_response)."""

    def __init__(self, max_tree_depth: int = 24,
                 max_cached_requests: int = 1000) -> None:
        self.max_tree_depth = max_tree_depth
        self.max_cached_requests = max_cached_requests
        self.global_tree = _Tree(max_tree_depth)
        self._prompt_trees: dict[str, _Tree] = {}
        self._responses: dict[str, list[int]] = {}
        # FIFO of finished requests still counted in the global tree.
        self._cached: OrderedDict[str, list[int]] = OrderedDict()

    @property
    def active_requests(self) -> set[str]:
        return set(self._prompt_trees)

    @property
    def cached_requests(self) -> set[str]:
        return set(self._cached)

    def start_request(self, req_id: str, prompt_ids) -> None:
        tree = _Tree(self.max_tree_depth)
        tree.add_sequence(list(prompt_ids))
        self._prompt_trees[req_id] = tree
        self._responses[req_id] = []

    def add_active_response(self, req_id: str, token_ids) -> None:
        resp = self._responses[req_id]
        for tok in token_ids:
            resp.append(int(tok))
            self.global_tree.add_suffixes_ending_at(resp, len(resp) - 1)

    def stop_request(self, req_id: str) -> None:
        self._prompt_trees.pop(req_id, None)
        resp = self._responses.pop(req_id, None)
        if resp:
            self._cached[req_id] = resp
            while len(self._cached) > self.max_cached_requests:
                self.evict_cached_response(next(iter(self._cached)))

    def evict_cached_response(self, req_id: str) -> None:
        resp = self._cached.pop(req_id, None)
        if resp:
            self.global_tree.remove_sequence(resp)

    def speculate(self, req_id: str, pattern, max_spec_tokens: int,
                  max_spec_factor: float = 1.0,
                  min_token_prob: float = 0.1) -> list[int]:
        pattern = [int(t) for t in pattern]
        best: list[int] = []
        for tree in (self.global_tree, self._prompt_trees.get(req_id)):
            if tree is None:
                continue
            for node, match_len in tree.matches(pattern):
                limit = min(max_spec_tokens,
                            int(max_spec_factor * match_len))
                draft = _greedy_walk(node, limit, min_token_prob)
                if len(draft) > len(best):
                    best = draft
                if len(best) >= max_spec_tokens:
                    break
        return best


class SuffixProposer:
    """Runner-facing host drafter (like NgramProposer but with
    per-request lifecycle; ref: SuffixDecodingProposer.propose)."""

    needs_request_state = True

    def __init__(self, config: SpeculativeConfig) -> None:
        self.k = config.num_speculative_tokens
        self.max_spec_factor = config.suffix_decoding_max_spec_factor
        self.min_token_prob = config.suffix_decoding_min_token_prob
        self.cache = SuffixDecodingCache(
            max_tree_depth=config.suffix_decoding_max_tree_depth,
            max_cached_requests=config.suffix_decoding_max_cached_requests)

    def propose_for(self, req_id: str, token_ids: list[int],
                    prompt_len: int, new_token_ids: list[int]):
        if req_id not in self.cache.active_requests:
            if req_id in self.cache.cached_requests:
                self.cache.evict_cached_response(req_id)
            self.cache.start_request(req_id, token_ids[:prompt_len])
        self.cache.add_active_response(req_id, new_token_ids)
        start = max(0, len(token_ids) - self.cache.max_tree_depth)
        return self.cache.speculate(
            req_id, token_ids[start:], max_spec_tokens=self.k,
            max_spec_factor=self.max_spec_factor,
            min_token_prob=self.min_token_prob)

    def sync_active(self, live_req_ids) -> None:
        """Finish (move to the cached tier) any request that left the
        batch — ref: suffix_decoding.py propose() tail loop."""
        for req_id in self.cache.active_requests - set(live_req_ids):
            self.cache.stop_request(req_id)
