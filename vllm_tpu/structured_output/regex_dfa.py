"""Regex -> DFA compiler over the byte alphabet.

Structured-output backends in the reference delegate regex/JSON-schema
constraints to external FSM libraries (ref: vllm/v1/structured_output/
backend_outlines.py / backend_xgrammar.py, which compile the pattern to
a token-level automaton). None of those ship here, so this module is a
self-contained engine: parse a practical regex subset, build a Thompson
NFA, subset-construct a DFA whose transitions are over *bytes* (UTF-8
encoded), which token_fsm.py then lifts to token-id space.

Supported syntax: literals, escapes (\\n \\t \\r \\\\ \\. etc.),
``.`` (any byte except newline), classes ``[a-z0-9_]`` / ``[^...]``,
shorthands ``\\d \\w \\s \\D \\W \\S``, quantifiers ``* + ? {m} {m,}
{m,n}``, alternation ``|``, groups ``(...)`` (and non-capturing
``(?:...)``). Matching is anchored (fullmatch semantics), matching the
reference's guided-decoding contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

ANY_BYTE = frozenset(range(256))
_DIGITS = frozenset(b"0123456789")
_WORD = frozenset(b"abcdefghijklmnopqrstuvwxyz"
                  b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")
_SPACE = frozenset(b" \t\r\n\f\v")


# -- parsing ------------------------------------------------------------
# AST: ("lit", frozenset[bytes]) | ("cat", [..]) | ("alt", [..])
#      | ("star", node) | ("plus", node) | ("opt", node)
#      | ("rep", node, m, n|None) | ("eps",)


class RegexError(ValueError):
    pass


class _Parser:

    def __init__(self, pattern: str) -> None:
        self.b = pattern.encode("utf-8")
        self.i = 0

    def peek(self) -> Optional[int]:
        return self.b[self.i] if self.i < len(self.b) else None

    def take(self) -> int:
        c = self.b[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self._alt()
        if self.i != len(self.b):
            raise RegexError(f"unexpected ')' at {self.i}")
        return node

    def _alt(self):
        branches = [self._cat()]
        while self.peek() == ord("|"):
            self.take()
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        items = []
        while self.peek() is not None and self.peek() not in (ord("|"),
                                                              ord(")")):
            items.append(self._quant())
        if not items:
            return ("eps", )
        return items[0] if len(items) == 1 else ("cat", items)

    def _quant(self):
        node = self._atom()
        while True:
            c = self.peek()
            if c == ord("*"):
                self.take()
                node = ("star", node)
            elif c == ord("+"):
                self.take()
                node = ("plus", node)
            elif c == ord("?"):
                self.take()
                node = ("opt", node)
            elif c == ord("{"):
                save = self.i
                rep = self._try_rep(node)
                if rep is None:
                    self.i = save
                    break
                node = rep
            else:
                break
        return node

    def _try_rep(self, node):
        self.take()  # {
        m_digits = []
        while self.peek() is not None and chr(self.peek()).isdigit():
            m_digits.append(chr(self.take()))
        if not m_digits:
            return None
        m = int("".join(m_digits))
        n: Optional[int] = m
        if self.peek() == ord(","):
            self.take()
            n_digits = []
            while self.peek() is not None and chr(self.peek()).isdigit():
                n_digits.append(chr(self.take()))
            n = int("".join(n_digits)) if n_digits else None
        if self.peek() != ord("}"):
            return None
        self.take()
        return ("rep", node, m, n)

    def _atom(self):
        c = self.peek()
        if c is None:
            return ("eps", )
        if c == ord("("):
            self.take()
            if (self.peek() == ord("?") and self.i + 1 < len(self.b)
                    and self.b[self.i + 1] == ord(":")):
                self.take()
                self.take()
            node = self._alt()
            if self.peek() != ord(")"):
                raise RegexError("unclosed group")
            self.take()
            return node
        if c == ord("["):
            return ("lit", self._class())
        if c == ord("."):
            self.take()
            return ("lit", frozenset(ANY_BYTE - {ord("\n")}))
        if c == ord("\\"):
            self.take()
            return ("lit", self._escape())
        if c in (ord("*"), ord("+"), ord("?"), ord("|"), ord(")")):
            raise RegexError(f"unexpected {chr(c)!r}")
        if c in (ord("^"), ord("$")):
            # anchored already; treat as epsilon
            self.take()
            return ("eps", )
        self.take()
        if c < 0x80:
            return ("lit", frozenset({c}))
        # Multi-byte UTF-8 literal char: concatenate its bytes.
        start = self.i - 1
        n_more = (1 if c >> 5 == 0b110 else
                  2 if c >> 4 == 0b1110 else 3)
        seq = [c]
        for _ in range(n_more):
            if self.peek() is None:
                break
            seq.append(self.take())
        return ("cat", [("lit", frozenset({byte})) for byte in seq])

    def _escape(self) -> frozenset:
        c = self.take()
        table = {
            ord("d"): _DIGITS,
            ord("D"): ANY_BYTE - _DIGITS,
            ord("w"): _WORD,
            ord("W"): ANY_BYTE - _WORD,
            ord("s"): _SPACE,
            ord("S"): ANY_BYTE - _SPACE,
            ord("n"): frozenset({ord("\n")}),
            ord("t"): frozenset({ord("\t")}),
            ord("r"): frozenset({ord("\r")}),
            ord("f"): frozenset({ord("\f")}),
            ord("v"): frozenset({ord("\v")}),
            ord("0"): frozenset({0}),
        }
        if c in table:
            return frozenset(table[c])
        if c == ord("x"):
            hx = chr(self.take()) + chr(self.take())
            return frozenset({int(hx, 16)})
        return frozenset({c})  # escaped literal (\. \[ \\ ...)

    def _class(self) -> frozenset:
        self.take()  # [
        negate = False
        if self.peek() == ord("^"):
            negate = True
            self.take()
        members: set[int] = set()
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise RegexError("unclosed class")
            if c == ord("]") and not first:
                self.take()
                break
            first = False
            if c == ord("\\"):
                self.take()
                sub = self._escape()
                if len(sub) > 1:
                    members |= sub
                    continue
                lo = next(iter(sub))
            else:
                lo = self.take()
            if (self.peek() == ord("-") and self.i + 1 < len(self.b)
                    and self.b[self.i + 1] != ord("]")):
                self.take()
                hi = self.take()
                if hi == ord("\\"):
                    hi = next(iter(self._escape()))
                members |= set(range(lo, hi + 1))
            else:
                members.add(lo)
        result = frozenset(members)
        return frozenset(ANY_BYTE - result) if negate else result


# -- NFA ----------------------------------------------------------------


@dataclass
class _NFA:
    # transitions[state] = list of (byteset | None for eps, next_state)
    transitions: list[list[tuple[Optional[frozenset], int]]] = field(
        default_factory=list)

    def new_state(self) -> int:
        self.transitions.append([])
        return len(self.transitions) - 1

    def add(self, s: int, byteset: Optional[frozenset], t: int) -> None:
        self.transitions[s].append((byteset, t))


def _build(nfa: _NFA, node) -> tuple[int, int]:
    """Returns (start, accept) fragment for the AST node."""
    kind = node[0]
    if kind == "eps":
        s = nfa.new_state()
        return s, s
    if kind == "lit":
        s, t = nfa.new_state(), nfa.new_state()
        nfa.add(s, node[1], t)
        return s, t
    if kind == "cat":
        start, acc = _build(nfa, node[1][0])
        for child in node[1][1:]:
            s2, a2 = _build(nfa, child)
            nfa.add(acc, None, s2)
            acc = a2
        return start, acc
    if kind == "alt":
        s, t = nfa.new_state(), nfa.new_state()
        for child in node[1]:
            cs, ca = _build(nfa, child)
            nfa.add(s, None, cs)
            nfa.add(ca, None, t)
        return s, t
    if kind == "star":
        s, t = nfa.new_state(), nfa.new_state()
        cs, ca = _build(nfa, node[1])
        nfa.add(s, None, cs)
        nfa.add(s, None, t)
        nfa.add(ca, None, cs)
        nfa.add(ca, None, t)
        return s, t
    if kind == "plus":
        return _build(nfa, ("cat", [node[1], ("star", node[1])]))
    if kind == "opt":
        return _build(nfa, ("alt", [node[1], ("eps", )]))
    if kind == "rep":
        _, child, m, n = node
        parts = [child] * m
        if n is None:
            parts.append(("star", child))
        else:
            if n < m:
                raise RegexError(f"bad repetition {{{m},{n}}}")
            parts.extend([("opt", child)] * (n - m))
        if not parts:
            return _build(nfa, ("eps", ))
        return _build(nfa, ("cat", parts) if len(parts) > 1 else parts[0])
    raise RegexError(f"unknown node {kind}")


# -- DFA ----------------------------------------------------------------


class DFA:
    """Dense byte-transition DFA. ``trans`` is a list of 256-entry
    lists (-1 = dead); ``accepting`` a list of bools. State 0 = start."""

    __slots__ = ("trans", "accepting")

    def __init__(self, trans: list[list[int]],
                 accepting: list[bool]) -> None:
        self.trans = trans
        self.accepting = accepting

    @property
    def num_states(self) -> int:
        return len(self.trans)

    def step(self, state: int, byte: int) -> int:
        return self.trans[state][byte] if state >= 0 else -1

    def walk(self, state: int, data: bytes) -> int:
        for byte in data:
            state = self.trans[state][byte]
            if state < 0:
                return -1
        return state

    def fullmatch(self, data: bytes) -> bool:
        s = self.walk(0, data)
        return s >= 0 and self.accepting[s]

    def live(self, state: int) -> bool:
        """Some continuation exists (state is not a dead end unless
        accepting)."""
        return state >= 0


def compile_regex(pattern: str) -> DFA:
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    start, accept = _build(nfa, ast)

    def eps_closure(states: frozenset) -> frozenset:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for byteset, t in nfa.transitions[s]:
                if byteset is None and t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = eps_closure(frozenset({start}))
    dfa_states: dict[frozenset, int] = {start_set: 0}
    trans: list[list[int]] = [[-1] * 256]
    accepting = [accept in start_set]
    work = [start_set]
    while work:
        cur = work.pop()
        cur_id = dfa_states[cur]
        # Group outgoing byte transitions.
        by_byte: dict[int, set] = {}
        for s in cur:
            for byteset, t in nfa.transitions[s]:
                if byteset is None:
                    continue
                for byte in byteset:
                    by_byte.setdefault(byte, set()).add(t)
        # Dedup identical target sets to limit closure calls.
        cache: dict[frozenset, int] = {}
        for byte, targets in by_byte.items():
            key = frozenset(targets)
            tid = cache.get(key)
            if tid is None:
                closed = eps_closure(key)
                tid = dfa_states.get(closed)
                if tid is None:
                    tid = len(trans)
                    dfa_states[closed] = tid
                    trans.append([-1] * 256)
                    accepting.append(accept in closed)
                    work.append(closed)
                cache[key] = tid
            trans[cur_id][byte] = tid
    return DFA(trans, accepting)
