"""Grammar-constrained decoding: token-trie backend + bitmask plumbing.

Ref analog: vllm/v1/structured_output/ (StructuredOutputManager:35 with
xgrammar/guidance/outlines backends; the bitmask is applied at
sampling). Round-1 backend: ``guided_choice`` — output must be exactly
one of N strings. Choices are tokenized once; decoding walks a trie of
token sequences, and the per-step bitmask allows only the current
node's children (plus EOS at accepting nodes).

The general mechanism (per-row vocab bitmask ANDed into the logits
before sampling) is backend-agnostic; richer grammars (JSON schema,
regex FSMs) plug in behind the same ``allowed/advance`` protocol.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class TokenTrieGrammar:
    """Trie over token sequences; state = node id."""

    ROOT = 0

    def __init__(self, sequences: list[list[int]],
                 eos_token_id: Optional[int]) -> None:
        assert sequences, "empty choice list"
        self.eos = eos_token_id
        # node -> {token: child}
        self.children: list[dict[int, int]] = [{}]
        self.accepting: list[bool] = [False]
        for seq in sequences:
            node = self.ROOT
            for tok in seq:
                nxt = self.children[node].get(tok)
                if nxt is None:
                    nxt = len(self.children)
                    self.children.append({})
                    self.accepting.append(False)
                    self.children[node][tok] = nxt
                node = nxt
            self.accepting[node] = True

    def allowed_tokens(self, state: int) -> list[int]:
        toks = list(self.children[state].keys())
        if self.accepting[state] and self.eos is not None:
            toks.append(self.eos)
        return toks

    def advance(self, state: int, token: int) -> Optional[int]:
        """Next state, or None if the token ends/breaks the grammar."""
        if token == self.eos:
            return None  # finished
        return self.children[state].get(token)

    def is_exhausted(self, state: int) -> bool:
        """No continuations: only EOS remains."""
        return not self.children[state]


def build_choice_grammar(choices: list[str], tokenizer,
                         eos_token_id: Optional[int]) -> TokenTrieGrammar:
    seqs = [
        tokenizer.encode(c, add_special_tokens=False) for c in choices
    ]
    return TokenTrieGrammar(seqs, eos_token_id)


class GrammarState:
    """Per-request decoding state carried by the runner.

    Works with any grammar speaking the allowed/advance protocol
    (token trie here, DFA-backed token FSM in token_fsm.py)."""

    def __init__(self, grammar) -> None:
        self.grammar = grammar
        self.node: Optional[int] = grammar.ROOT

    @property
    def active(self) -> bool:
        return self.node is not None

    def allowed_tokens(self) -> list[int]:
        assert self.node is not None
        return self.grammar.allowed_tokens(self.node)

    def allowed_mask_packed(self, vocab_size: int) -> np.ndarray:
        """uint32[ceil(V/32)] little-endian allow-bitmask for the
        current state, cached per grammar state (the per-step host
        cost is a dict hit + memcpy, not O(V) writes — ref analog:
        xgrammar's fill_next_token_bitmask)."""
        assert self.node is not None
        g = self.grammar
        if hasattr(g, "allowed_mask"):  # TokenFSMGrammar: native
            return g.allowed_mask(self.node)
        cache = getattr(g, "_packed_cache", None)
        if cache is None:
            cache = g._packed_cache = {}
        hit = cache.get(self.node)
        if hit is None:
            allow = np.zeros((vocab_size, ), bool)
            toks = [t for t in g.allowed_tokens(self.node)
                    if t < vocab_size]
            allow[toks] = True
            words = (vocab_size + 31) // 32
            packed = np.packbits(allow, bitorder="little")
            packed = np.pad(packed, (0, words * 4 - len(packed)))
            hit = cache[self.node] = packed.view(np.uint32)
        return hit

    def advance(self, token: int) -> None:
        if self.node is not None:
            self.node = self.grammar.advance(self.node, token)
