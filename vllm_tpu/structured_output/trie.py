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
    """Per-request decoding state carried by the runner."""

    def __init__(self, grammar: TokenTrieGrammar) -> None:
        self.grammar = grammar
        self.node: Optional[int] = TokenTrieGrammar.ROOT

    @property
    def active(self) -> bool:
        return self.node is not None

    def allowed_tokens(self) -> list[int]:
        assert self.node is not None
        return self.grammar.allowed_tokens(self.node)

    def advance(self, token: int) -> None:
        if self.node is not None:
            self.node = self.grammar.advance(self.node, token)
