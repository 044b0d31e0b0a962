"""Token-level FSM: lifts a byte DFA (regex_dfa) to token-id space.

Ref analog: vllm/v1/structured_output/backend_xgrammar.py /
backend_outlines.py — those delegate to compiled grammar libraries that
produce per-state token bitmasks applied at sampling (bitmask filled by
``get_grammar_bitmask``, core.py:593). Here the lift is computed
directly: for each DFA state visited during decoding, walk every
vocabulary token's UTF-8 bytes through the DFA **vectorized with
numpy** (tokens padded to a [V, L] byte matrix; L fused-steps of
``trans[state_vec, bytes[:, j]]``), yielding

- ``next_state[V]`` — DFA state after emitting each token (-1 = dead),
- a packed ``uint32[ceil(V/32)]`` allow-bitmask (token allowed iff its
  byte walk survives; EOS allowed iff the state is accepting).

Per-state results are cached, so steady-state decoding costs one dict
hit per step; masks are shared across requests holding the same
compiled grammar (the engine caches grammars by pattern). Thompson
construction guarantees every NFA state reaches the accept, so every
live DFA state has a viable continuation — "survives" == "allowed".
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vllm_tpu.structured_output.regex_dfa import DFA, compile_regex


def _gpt2_unicode_to_bytes() -> dict[str, int]:
    """Inverse of the GPT-2 bytes_to_unicode table (byte-level BPE
    tokenizers store raw bytes as printable unicode chars)."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def token_bytes_table(tokenizer, vocab_size: int) -> list[bytes]:
    """Exact byte string each token id contributes to the output.

    Three tokenizer families, detected from the vocab itself:
    byte-level BPE (GPT-2/Qwen/Llama-3 style: pieces are printable
    remappings of raw bytes), sentencepiece (``▁`` word-boundary +
    ``<0xNN>`` byte-fallback pieces), and plain. Special tokens and
    ids past the true vocab map to b"" (never allowed by the FSM).
    """
    specials = set(getattr(tokenizer, "all_special_ids", []) or [])
    n = min(vocab_size, len(tokenizer))
    pieces = tokenizer.convert_ids_to_tokens(list(range(n)))
    u2b = _gpt2_unicode_to_bytes()
    # Byte-level iff every non-special piece decodes through the table.
    sample = [p for i, p in enumerate(pieces[:2048])
              if p is not None and i not in specials]
    byte_level = bool(sample) and all(
        all(ch in u2b for ch in p) for p in sample[:256])
    out: list[bytes] = []
    for tid in range(vocab_size):
        piece = pieces[tid] if tid < n else None
        if piece is None or tid in specials:
            out.append(b"")
            continue
        if byte_level:
            try:
                out.append(bytes(u2b[ch] for ch in piece))
                continue
            except KeyError:
                pass  # added token stored verbatim
        if len(piece) == 6 and piece.startswith("<0x") and \
                piece.endswith(">"):
            out.append(bytes([int(piece[3:5], 16)]))
            continue
        out.append(piece.replace("▁", " ").encode("utf-8"))
    return out


def _token_byte_matrix(
        tokenizer, vocab_size: int) -> tuple[np.ndarray, np.ndarray]:
    """[V, L] uint8 byte matrix (0-padded) + [V] lengths."""
    token_bytes = token_bytes_table(tokenizer, vocab_size)
    lens = np.array([len(b) for b in token_bytes], np.int32)
    L = max(1, int(lens.max()))
    mat = np.zeros((vocab_size, L), np.uint8)
    for tid, tb in enumerate(token_bytes):
        if tb:
            mat[tid, :len(tb)] = np.frombuffer(tb, np.uint8)
    return mat, lens


class TokenFSMGrammar:
    """DFA-backed grammar speaking the trie backend's protocol
    (allowed/advance/is_exhausted) plus packed-bitmask access.

    State ids are DFA state ids; ROOT is the DFA start state 0.
    """

    ROOT = 0

    def __init__(self, dfa: DFA, tokenizer, vocab_size: int,
                 eos_token_id: Optional[int],
                 byte_table: Optional[tuple[np.ndarray,
                                            np.ndarray]] = None) -> None:
        self.dfa = dfa
        self.eos = eos_token_id
        self.vocab_size = vocab_size
        if byte_table is None:
            byte_table = _token_byte_matrix(tokenizer, vocab_size)
        self.byte_mat, self.byte_lens = byte_table
        # Dense transition table with a trailing dead row so -1 states
        # index it safely: trans[S] == all -1.
        trans = np.asarray(dfa.trans, np.int32)
        self.trans = np.vstack([trans, np.full((1, 256), -1, np.int32)])
        self.dead_row = len(dfa.trans)
        self.accepting = np.asarray(dfa.accepting, bool)
        # state -> (next_state[V] int32, packed uint32[W])
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.mask_words = (vocab_size + 31) // 32

    # -- per-state lift (vectorized) ----------------------------------
    def _lift(self, state: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(state)
        if hit is not None:
            return hit
        V, L = self.byte_mat.shape
        sv = np.full((V, ), state, np.int32)
        for j in range(L):
            alive = self.byte_lens > j
            # Dead walks stay on the dead row; finished walks keep
            # their state (mapped through a no-op below).
            step = self.trans[np.where(sv < 0, self.dead_row, sv),
                              self.byte_mat[:, j]]
            sv = np.where(alive, step, sv)
        sv = np.where(self.byte_lens == 0, -1, sv)
        allow = sv >= 0
        if self.eos is not None and self.eos < V:
            allow[self.eos] = bool(self.accepting[state])
            sv[self.eos] = -1
        packed = np.packbits(allow, bitorder="little")
        packed = np.pad(packed, (0, self.mask_words * 4 - len(packed)))
        packed = packed.view(np.uint32)
        result = (sv, packed)
        self._cache[state] = result
        return result

    # -- trie-protocol surface ----------------------------------------
    def allowed_tokens(self, state: int) -> list[int]:
        sv, _ = self._lift(state)
        toks = np.nonzero(sv >= 0)[0].tolist()
        if self.eos is not None and self.accepting[state]:
            toks.append(self.eos)
        return toks

    def allowed_mask(self, state: int) -> np.ndarray:
        """Packed uint32[W] allow-bitmask for this state."""
        return self._lift(state)[1]

    def advance(self, state: int, token: int) -> Optional[int]:
        if token == self.eos:
            return None  # finished
        sv, _ = self._lift(state)
        nxt = int(sv[token]) if 0 <= token < len(sv) else -1
        return None if nxt < 0 else nxt

    def is_exhausted(self, state: int) -> bool:
        sv, _ = self._lift(state)
        return not bool((sv >= 0).any())


def build_regex_grammar(pattern: str, tokenizer, vocab_size: int,
                        eos_token_id: Optional[int],
                        byte_table=None) -> TokenFSMGrammar:
    return TokenFSMGrammar(compile_regex(pattern), tokenizer, vocab_size,
                           eos_token_id, byte_table)


def build_json_grammar(schema, tokenizer, vocab_size: int,
                       eos_token_id: Optional[int],
                       byte_table=None) -> TokenFSMGrammar:
    from vllm_tpu.structured_output.json_schema import (
        build_regex_from_schema)
    return build_regex_grammar(build_regex_from_schema(schema), tokenizer,
                               vocab_size, eos_token_id, byte_table)
