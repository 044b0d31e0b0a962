"""Context-free grammar backend: EBNF -> pushdown token automaton.

Ref analog: vllm/v1/structured_output/backend_xgrammar.py:1-363 — the
reference compiles EBNF/JSON-schema grammars with xgrammar into a
byte-level pushdown automaton plus an "adaptive token mask cache" that
classifies most of the vocabulary context-independently and resolves
only the boundary tokens against the live stack. Neither xgrammar nor
any grammar library ships in this environment, so this module is a
self-contained engine with the same architecture:

1. Parse a GBNF-style EBNF subset (llama.cpp dialect: ``root ::= ...``,
   terminals ``"..."``, byte classes ``[a-z0-9]`` / ``[^...]``,
   grouping, alternation, ``* + ?`` and ``{m,n}`` repetition).
2. Compile every rule to an NFA fragment over byte classes, with
   *call edges* for nonterminal references — a recursive transition
   network (RTN).  Unlike the regex DFA (regex_dfa.py) the language is
   not regular: recursion pushes the return node on a stack.
3. Decode-time state = frozen set of (node, stack) configurations.
   The per-state vocab bitmask is computed in two tiers, mirroring
   xgrammar's adaptive mask:

   - tier 1 (cached per *node*, stack-independent): walk every token's
     bytes through the RTN with a fresh local stack.  A walk that
     survives on local pushes/pops alone is ALLOWED for any outer
     stack; one that dies without ever popping an empty local stack is
     DEAD for any outer stack; only walks that need to pop past the
     local stack (tokens containing ``}``/``]``/rule-final bytes) are
     UNCERTAIN.  A vectorized first-byte prefilter kills the bulk of
     the vocabulary before the per-token walk.
   - tier 2 (cached per state): the UNCERTAIN remainder is re-walked
     against the request's real stack.

Grammar states are shared across requests via the engine's grammar
cache, and the mask protocol (``allowed_mask_packed``) is identical to
the trie/DFA backends, so the runner plumbing is unchanged.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

ByteSet = frozenset  # frozenset[int] over 0..255
ANY_BYTE = frozenset(range(256))


class GrammarError(ValueError):
    pass


# -- GBNF parsing ---------------------------------------------------------
# AST mirrors regex_dfa's: ("lit", ByteSet) | ("seq", [..]) | ("alt", [..])
# | ("star"|"plus"|"opt", node) | ("rep", node, m, n|None) | ("eps",)
# | ("ref", rule_name)


class _GbnfParser:
    """Parses the llama.cpp GBNF dialect (a conventional public EBNF
    format): ``name ::= expansion`` lines, ``#`` comments, string
    terminals with escapes, char classes, grouping/alternation and
    regex-style repetition suffixes."""

    def __init__(self, text: str) -> None:
        self.s = text
        self.i = 0

    # -- low-level --------------------------------------------------
    def _peek(self) -> Optional[str]:
        return self.s[self.i] if self.i < len(self.s) else None

    def _take(self) -> str:
        ch = self.s[self.i]
        self.i += 1
        return ch

    def _ws(self, newlines: bool) -> None:
        while self.i < len(self.s):
            ch = self.s[self.i]
            if ch == "#":  # comment to end of line
                while self.i < len(self.s) and self.s[self.i] != "\n":
                    self.i += 1
            elif ch in " \t\r" or (newlines and ch == "\n"):
                self.i += 1
            else:
                break

    # -- grammar ----------------------------------------------------
    def parse(self) -> dict[str, tuple]:
        rules: dict[str, tuple] = {}
        self._ws(newlines=True)
        while self.i < len(self.s):
            name = self._name()
            self._ws(newlines=False)
            if self.s[self.i:self.i + 3] != "::=":
                raise GrammarError(
                    f"expected '::=' after rule name {name!r}")
            self.i += 3
            rules[name] = self._alternates()
            self._ws(newlines=True)
        if "root" not in rules:
            raise GrammarError("grammar must define a 'root' rule")
        return rules

    def _name(self) -> str:
        self._ws(newlines=True)
        start = self.i
        while self.i < len(self.s) and (self.s[self.i].isalnum()
                                        or self.s[self.i] in "-_"):
            self.i += 1
        if start == self.i:
            raise GrammarError(f"expected rule name at {self.i}")
        return self.s[start:self.i]

    def _alternates(self) -> tuple:
        branches = [self._sequence()]
        while True:
            self._ws(newlines=False)
            # A '|' may start a continuation line.
            save = self.i
            self._ws(newlines=True)
            if self._peek() == "|":
                self._take()
                branches.append(self._sequence())
            else:
                self.i = save
                break
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _sequence(self) -> tuple:
        items = []
        while True:
            self._ws(newlines=False)
            ch = self._peek()
            if ch is None or ch in "|)\n":
                break
            # New rule on the next line? A name followed by ::= ends
            # this rule (handled by the newline break above).
            items.append(self._repeated())
        if not items:
            return ("eps", )
        return items[0] if len(items) == 1 else ("seq", items)

    def _repeated(self) -> tuple:
        node = self._atom()
        while True:
            self._ws(newlines=False)
            ch = self._peek()
            if ch == "*":
                self._take()
                node = ("star", node)
            elif ch == "+":
                self._take()
                node = ("plus", node)
            elif ch == "?":
                self._take()
                node = ("opt", node)
            elif ch == "{":
                save = self.i
                rep = self._try_rep(node)
                if rep is None:
                    self.i = save
                    break
                node = rep
            else:
                break
        return node

    def _try_rep(self, node) -> Optional[tuple]:
        self._take()  # {
        m_digits = ""
        while (self._peek() or "").isdigit():
            m_digits += self._take()
        if not m_digits:
            return None
        m = int(m_digits)
        n: Optional[int] = m
        if self._peek() == ",":
            self._take()
            n_digits = ""
            while (self._peek() or "").isdigit():
                n_digits += self._take()
            n = int(n_digits) if n_digits else None
        if self._peek() != "}":
            return None
        self._take()
        return ("rep", node, m, n)

    def _atom(self) -> tuple:
        ch = self._peek()
        if ch == "(":
            self._take()
            node = self._alternates()
            self._ws(newlines=True)
            if self._peek() != ")":
                raise GrammarError("unclosed group")
            self._take()
            return node
        if ch == '"':
            return self._terminal()
        if ch == "[":
            return ("lit", self._char_class())
        if ch is not None and (ch.isalnum() or ch in "-_"):
            return ("ref", self._name())
        raise GrammarError(f"unexpected {ch!r} at {self.i}")

    def _terminal(self) -> tuple:
        self._take()  # "
        data = bytearray()
        while True:
            ch = self._peek()
            if ch is None:
                raise GrammarError("unterminated string terminal")
            if ch == '"':
                self._take()
                break
            if ch == "\\":
                self._take()
                data.extend(self._escape_bytes())
            else:
                data.extend(self._take().encode("utf-8"))
        if not data:
            return ("eps", )
        return ("seq", [("lit", frozenset({b})) for b in data]) \
            if len(data) > 1 else ("lit", frozenset({data[0]}))

    def _escape_bytes(self) -> bytes:
        ch = self._take()
        simple = {"n": b"\n", "t": b"\t", "r": b"\r", '"': b'"',
                  "\\": b"\\", "/": b"/", "'": b"'", "0": b"\x00",
                  "]": b"]", "[": b"[", "^": b"^", "-": b"-"}
        if ch in simple:
            return simple[ch]
        if ch == "x":
            return bytes([int(self._take() + self._take(), 16)])
        if ch == "u":
            cp = int("".join(self._take() for _ in range(4)), 16)
            return chr(cp).encode("utf-8")
        if ch == "U":
            cp = int("".join(self._take() for _ in range(8)), 16)
            return chr(cp).encode("utf-8")
        return ch.encode("utf-8")

    def _char_class(self) -> ByteSet:
        self._take()  # [
        negate = False
        if self._peek() == "^":
            negate = True
            self._take()
        members: set[int] = set()
        first = True
        while True:
            ch = self._peek()
            if ch is None:
                raise GrammarError("unclosed char class")
            if ch == "]" and not first:
                self._take()
                break
            first = False
            lo = self._class_char()
            if (self._peek() == "-" and self.i + 1 < len(self.s)
                    and self.s[self.i + 1] != "]"):
                self._take()
                hi = self._class_char()
                if hi < lo:
                    raise GrammarError("reversed class range")
                if hi > 0x10FFFF:
                    raise GrammarError("class range above unicode")
                if lo < 0x80 and hi < 0x80:
                    members |= set(range(lo, hi + 1))
                else:
                    # Multi-byte ranges degenerate to "any UTF-8
                    # continuation structure" — approximate by byte
                    # membership of all lead+continuation bytes, which
                    # is what a byte-level automaton can express.
                    for cp in (lo, hi):
                        members |= set(chr(cp).encode("utf-8"))
                    members |= set(range(0x80, 0xC0))
            else:
                if lo < 0x80:
                    members.add(lo)
                else:
                    members |= set(chr(lo).encode("utf-8"))
        result = frozenset(members)
        return frozenset(ANY_BYTE - result) if negate else result

    def _class_char(self) -> int:
        ch = self._take()
        if ch == "\\":
            b = self._escape_bytes()
            if len(b) == 1:
                return b[0]
            return ord(b.decode("utf-8"))
        return ord(ch)


# -- RTN compilation ------------------------------------------------------


class RTN:
    """Recursive transition network over bytes.

    Per node: byte edges ``(ByteSet, next)``, epsilon edges ``next``,
    call edges ``(rule_id, return_node)`` and a ``final`` flag (rule
    return).  Rule ``starts[rule_id]`` is the entry node.
    """

    def __init__(self) -> None:
        self.byte_edges: list[list[tuple[ByteSet, int]]] = []
        self.eps_edges: list[list[int]] = []
        self.call_edges: list[list[tuple[int, int]]] = []
        self.final: list[bool] = []
        self.starts: list[int] = []
        self.rule_names: list[str] = []

    def new_node(self) -> int:
        self.byte_edges.append([])
        self.eps_edges.append([])
        self.call_edges.append([])
        self.final.append(False)
        return len(self.final) - 1


def compile_gbnf(text: str) -> RTN:
    rules = _GbnfParser(text).parse()
    rtn = RTN()
    rule_ids = {name: i for i, name in enumerate(rules)}
    rtn.rule_names = list(rules)
    rtn.starts = [rtn.new_node() for _ in rules]
    ends = [rtn.new_node() for _ in rules]
    for e in ends:
        rtn.final[e] = True

    def build(node, start: int, accept: int) -> None:
        kind = node[0]
        if kind == "eps":
            rtn.eps_edges[start].append(accept)
        elif kind == "lit":
            rtn.byte_edges[start].append((node[1], accept))
        elif kind == "ref":
            rid = rule_ids.get(node[1])
            if rid is None:
                raise GrammarError(f"undefined rule {node[1]!r}")
            rtn.call_edges[start].append((rid, accept))
        elif kind == "seq":
            cur = start
            for child in node[1][:-1]:
                nxt = rtn.new_node()
                build(child, cur, nxt)
                cur = nxt
            build(node[1][-1], cur, accept)
        elif kind == "alt":
            for child in node[1]:
                s = rtn.new_node()
                rtn.eps_edges[start].append(s)
                build(child, s, accept)
        elif kind == "star":
            hub = rtn.new_node()
            rtn.eps_edges[start].append(hub)
            rtn.eps_edges[hub].append(accept)
            s = rtn.new_node()
            rtn.eps_edges[hub].append(s)
            build(node[1], s, hub)
        elif kind == "plus":
            build(("seq", [node[1], ("star", node[1])]), start, accept)
        elif kind == "opt":
            build(("alt", [node[1], ("eps", )]), start, accept)
        elif kind == "rep":
            _, child, m, n = node
            parts = [child] * m
            if n is None:
                parts.append(("star", child))
            else:
                if n < m:
                    raise GrammarError(f"bad repetition {{{m},{n}}}")
                parts.extend([("opt", child)] * (n - m))
            build(("seq", parts) if len(parts) > 1 else
                  (parts[0] if parts else ("eps", )), start, accept)
        else:  # pragma: no cover
            raise GrammarError(f"unknown node {kind}")

    for name, ast in rules.items():
        rid = rule_ids[name]
        build(ast, rtn.starts[rid], ends[rid])
    return rtn


# -- pushdown runtime -----------------------------------------------------

Config = tuple  # (node, stack-tuple of return nodes)
ALLOW, DEAD, UNCERTAIN = 1, 0, 2


class PushdownGrammar:
    """Grammar speaking the trie/DFA backend protocol with pushdown
    states.  ``ROOT`` and every state handed to ``advance`` /
    ``allowed_mask`` is a frozenset of (node, stack) configs, closed
    under epsilon/call/final moves; acceptance is tracked via the
    special config ``(-1, ())``."""

    ACCEPT = (-1, ())

    def __init__(self, rtn: RTN, tokenizer, vocab_size: int,
                 eos_token_id: Optional[int],
                 byte_table: Optional[tuple[np.ndarray,
                                            np.ndarray]] = None) -> None:
        from vllm_tpu.structured_output.token_fsm import _token_byte_matrix
        self.rtn = rtn
        self.eos = eos_token_id
        self.vocab_size = vocab_size
        if byte_table is None:
            byte_table = _token_byte_matrix(tokenizer, vocab_size)
        self.byte_mat, self.byte_lens = byte_table
        self.mask_words = (vocab_size + 31) // 32
        # token id -> bytes (only live tokens)
        self._tok_bytes = [
            self.byte_mat[t, :self.byte_lens[t]].tobytes()
            for t in range(vocab_size)
        ]
        # tier-1 caches, per node: (verdict uint8[V], next-config lists
        # for ALLOW tokens are NOT cached — advance() re-walks exactly)
        self._node_verdict: dict[int, np.ndarray] = {}
        self._node_firstbytes: dict[int, np.ndarray] = {}
        # tier-2 / mask caches, per frozen state
        self._mask_cache: dict[frozenset, np.ndarray] = {}
        self.ROOT = self._closure([(rtn.starts[0], ())])

    # -- closure ----------------------------------------------------
    def _closure(self, configs) -> frozenset:
        """Epsilon/call/final closure.  Returns the frozenset of
        configs whose node has at least one byte edge, plus ACCEPT if
        the root rule can complete here."""
        rtn = self.rtn
        out: set[Config] = set()
        seen: set[Config] = set()
        stack = list(configs)
        while stack:
            node, st = stack.pop()
            if (node, st) in seen:
                continue
            seen.add((node, st))
            if node == -1:
                out.add(self.ACCEPT)
                continue
            if rtn.byte_edges[node]:
                out.add((node, st))
            for nxt in rtn.eps_edges[node]:
                stack.append((nxt, st))
            for rid, ret in rtn.call_edges[node]:
                stack.append((rtn.starts[rid], st + (ret, )))
            if rtn.final[node]:
                if st:
                    stack.append((st[-1], st[:-1]))
                else:
                    stack.append((-1, ()))
        return frozenset(out)

    def _step_configs(self, configs: frozenset, byte: int) -> frozenset:
        nxt = []
        for node, st in configs:
            if node < 0:
                continue
            for byteset, tgt in self.rtn.byte_edges[node]:
                if byte in byteset:
                    nxt.append((tgt, st))
        return self._closure(nxt) if nxt else frozenset()

    def _walk(self, configs: frozenset, data: bytes) -> frozenset:
        for b in data:
            configs = self._step_configs(configs, b)
            if not configs:
                break
        return configs

    # -- tier-1: per-node stack-independent classification -----------
    def _local_first_bytes(self, node: int) -> np.ndarray:
        hit = self._node_firstbytes.get(node)
        if hit is not None:
            return hit
        allowed = np.zeros(256, bool)
        for n2, _ in self._closure([(node, ())]):
            if n2 < 0:
                continue
            for byteset, _tgt in self.rtn.byte_edges[n2]:
                allowed[list(byteset)] = True
        self._node_firstbytes[node] = allowed
        return allowed

    def _classify_node(self, node: int) -> np.ndarray:
        """uint8[V] verdict per token for walks starting at (node, ())
        where popping the empty local stack parks the walk on a
        BOUNDARY config instead of dying: surviving locally => ALLOW,
        no survivors and no parked boundary => DEAD, else UNCERTAIN."""
        hit = self._node_verdict.get(node)
        if hit is not None:
            return hit
        V = self.vocab_size
        verdict = np.zeros(V, np.uint8)
        first_ok = self._local_first_bytes(node)
        lens = self.byte_lens
        first = self.byte_mat[:, 0]
        candidates = np.nonzero((lens > 0) & first_ok[first])[0]
        base = self._closure_local([(node, ())])
        for tid in candidates:
            verdict[tid] = self._walk_local(base, self._tok_bytes[tid])
        self._node_verdict[node] = verdict
        return verdict

    # Local-closure variant: popping an empty stack parks on (-2, ())
    # (BOUNDARY — outcome depends on the outer stack).  ACCEPT configs
    # also park as boundary: whether the *global* walk survives there
    # depends on the outer context too.
    def _closure_local(self, configs) -> tuple[frozenset, bool]:
        rtn = self.rtn
        out: set[Config] = set()
        boundary = False
        seen: set[Config] = set()
        stack = list(configs)
        while stack:
            node, st = stack.pop()
            if (node, st) in seen:
                continue
            seen.add((node, st))
            if rtn.byte_edges[node]:
                out.add((node, st))
            for nxt in rtn.eps_edges[node]:
                stack.append((nxt, st))
            for rid, ret in rtn.call_edges[node]:
                stack.append((rtn.starts[rid], st + (ret, )))
            if rtn.final[node]:
                if st:
                    stack.append((st[-1], st[:-1]))
                else:
                    boundary = True
        return frozenset(out), boundary

    def _walk_local(self, base: tuple[frozenset, bool],
                    data: bytes) -> int:
        configs, boundary = base
        hit_boundary = boundary
        for i, b in enumerate(data):
            nxt = []
            for node, st in configs:
                for byteset, tgt in self.rtn.byte_edges[node]:
                    if b in byteset:
                        nxt.append((tgt, st))
            if not nxt:
                return UNCERTAIN if hit_boundary else DEAD
            configs, bnd = self._closure_local(nxt)
            hit_boundary = hit_boundary or bnd
            if not configs:
                # Every path returned out of the local context.
                return UNCERTAIN if hit_boundary else DEAD
        if configs:
            return ALLOW
        return UNCERTAIN if hit_boundary else DEAD

    # -- protocol -----------------------------------------------------
    def allowed_mask(self, state: frozenset) -> np.ndarray:
        hit = self._mask_cache.get(state)
        if hit is not None:
            return hit
        V = self.vocab_size
        allow = np.zeros(V, bool)
        uncertain = np.zeros(V, bool)
        for node, _st in state:
            if node < 0:
                continue
            v = self._classify_node(node)
            allow |= v == ALLOW
            uncertain |= v == UNCERTAIN
        # tier 2: exact pushdown walk for boundary tokens only.
        for tid in np.nonzero(uncertain & ~allow)[0]:
            if self._walk(state, self._tok_bytes[tid]):
                allow[tid] = True
        if self.eos is not None and self.eos < V:
            allow[self.eos] = self.ACCEPT in state
        packed = np.packbits(allow, bitorder="little")
        packed = np.pad(packed, (0, self.mask_words * 4 - len(packed)))
        packed = packed.view(np.uint32)
        self._mask_cache[state] = packed
        return packed

    def allowed_tokens(self, state: frozenset) -> list[int]:
        packed = self.allowed_mask(state)
        bits = np.unpackbits(packed.view(np.uint8), bitorder="little")
        return np.nonzero(bits[:self.vocab_size])[0].tolist()

    def advance(self, state: frozenset,
                token: int) -> Optional[frozenset]:
        if token == self.eos:
            return None  # finished
        if not (0 <= token < self.vocab_size):
            return None
        nxt = self._walk(state, self._tok_bytes[token])
        return nxt if nxt else None

    def is_exhausted(self, state: frozenset) -> bool:
        return all(node < 0 for node, _ in state)


def build_ebnf_grammar(text: str, tokenizer, vocab_size: int,
                       eos_token_id: Optional[int],
                       byte_table=None) -> PushdownGrammar:
    return PushdownGrammar(compile_gbnf(text), tokenizer, vocab_size,
                           eos_token_id, byte_table)


# -- JSON schema -> GBNF --------------------------------------------------

_JSON_DEFS = r"""
ws ::= [ \t\n\r]*
string ::= "\"" string-char* "\""
string-char ::= [^"\\\x00-\x1f] | "\\" (["\\/bfnrt] | "u" hex hex hex hex)
hex ::= [0-9a-fA-F]
integer ::= "-"? ("0" | [1-9] [0-9]*)
number ::= integer ("." [0-9]+)? (("e" | "E") ("+" | "-")? [0-9]+)?
boolean ::= "true" | "false"
null ::= "null"
value ::= object | array | string | number | boolean | null
object ::= "{" ws (member (ws "," ws member)*)? ws "}"
member ::= string ws ":" ws value
array ::= "[" ws (value (ws "," ws value)*)? ws "]"
"""


def json_schema_to_gbnf(schema: Union[dict, str, None]) -> str:
    """JSON schema -> GBNF covering what the regex backend cannot:
    recursion ($ref/$defs), unconstrained nesting (bare object/array
    types, additionalProperties), and any-value schemas.  Canonical
    no-whitespace serialization (ws rules kept for future laxness but
    pinned empty below), matching the regex backend's convention.

    Ref analog: xgrammar's builtin JSON grammar + schema converter
    (backend_xgrammar.py:168 uses xgr.Grammar.from_json_schema)."""
    import json as _json
    if isinstance(schema, str):
        schema = _json.loads(schema) if schema.strip() else {}
    if schema is None:
        schema = {}

    defs: dict[str, dict] = {}
    for key in ("$defs", "definitions"):
        for name, sub in (schema.get(key) or {}).items():
            defs[f"#/{key}/{name}"] = sub

    rules: dict[str, str] = {}
    counter = [0]
    ref_rule: dict[str, str] = {}

    def esc_literal(value) -> str:
        text = _json.dumps(value, separators=(",", ":"))
        out = []
        for ch in text:
            if ch == '"':
                out.append('\\"')
            elif ch == "\\":
                out.append("\\\\")
            elif ch in "\n\t\r":
                out.append({"\n": "\\n", "\t": "\\t", "\r": "\\r"}[ch])
            else:
                out.append(ch)
        return '"' + "".join(out) + '"'

    def fresh(base: str) -> str:
        counter[0] += 1
        return f"{base}-{counter[0]}"

    def convert(s, name: str) -> str:
        """Returns a GBNF *expression* for schema node s; may add
        helper rules."""
        if s is True or s == {} or s is None:
            return "value"
        if not isinstance(s, dict):
            raise GrammarError(f"unsupported schema node: {s!r}")
        if "$ref" in s:
            ref = s["$ref"]
            if ref == "#":
                return "root"
            if ref not in ref_rule:
                target = defs.get(ref)
                # accept both #/$defs/x and #/definitions/x spellings
                if target is None:
                    tail = ref.rsplit("/", 1)[-1]
                    for k, v in defs.items():
                        if k.rsplit("/", 1)[-1] == tail:
                            target = v
                            break
                if target is None:
                    raise GrammarError(f"unresolvable $ref {ref!r}")
                rname = fresh("ref")
                ref_rule[ref] = rname
                rules[rname] = convert(target, rname)
            return ref_rule[ref]
        if "enum" in s:
            return "(" + " | ".join(esc_literal(v)
                                    for v in s["enum"]) + ")"
        if "const" in s:
            return esc_literal(s["const"])
        if "anyOf" in s or "oneOf" in s:
            subs = s.get("anyOf") or s.get("oneOf")
            return "(" + " | ".join(
                convert(x, fresh(name)) for x in subs) + ")"
        t = s.get("type")
        if isinstance(t, list):
            return "(" + " | ".join(
                convert({**s, "type": x}, fresh(name)) for x in t) + ")"
        if t == "string":
            return "string"
        if t == "integer":
            return "integer"
        if t == "number":
            return "number"
        if t == "boolean":
            return "boolean"
        if t == "null":
            return "null"
        if t == "array":
            items = s.get("items", True)
            item_expr = convert(items, fresh(name))
            lo = s.get("minItems", 0)
            hi = s.get("maxItems")
            if hi == 0:
                return '"[]"'
            sep = f'("," {item_expr})'
            if lo == 0:
                more = f"{sep}*" if hi is None else sep + f"{{0,{hi - 1}}}"
                return f'"[" ({item_expr} {more})? "]"'
            more = (f"{sep}{{{lo - 1},}}" if hi is None else
                    f"{sep}{{{lo - 1},{hi - 1}}}")
            return f'"[" {item_expr} {more} "]"'
        if t == "object" or "properties" in s or \
                "additionalProperties" in s:
            props = s.get("properties", {})
            required = set(s.get("required", list(props)))
            addl = s.get("additionalProperties")
            if not props:
                if addl in (None, True) or addl == {}:
                    return "object"
                if addl is False:
                    return '"{}"'
                vexpr = convert(addl, fresh(name))
                mem = f'(string ":" {vexpr})'
                return f'"{{" ({mem} ("," {mem})*)? "}}"'
            segs = []
            first_done = False
            for pname, sub in props.items():
                key = esc_literal(pname)
                entry = f'({key} ":" {convert(sub, fresh(name))})'
                req = pname in required
                if not first_done:
                    if req:
                        segs.append(entry)
                        first_done = True
                    else:
                        segs.append(f'({entry} ","?)?')
                else:
                    segs.append(f'("," {entry})' if req else
                                f'("," {entry})?')
            return '"{" ' + " ".join(segs) + ' "}"'
        raise GrammarError(f"unsupported schema: {s!r}")

    root_expr = convert(schema, "root")
    lines = [f"root ::= {root_expr}"]
    for rname, expr in rules.items():
        lines.append(f"{rname} ::= {expr}")
    # Canonical serialization: no inter-token whitespace.
    lines.append('ws ::= ""')
    base = [ln for ln in _JSON_DEFS.strip().splitlines()
            if not ln.startswith("ws ::=")]
    return "\n".join(lines + base)


def schema_needs_cfg(schema: Union[dict, str, None]) -> bool:
    """True when the regex backend cannot express the schema: any-value
    nodes, recursion, unbounded nesting via bare object/array types, or
    additionalProperties with open values."""
    import json as _json
    if schema is None:
        return True
    if isinstance(schema, str):
        try:
            schema = _json.loads(schema) if schema.strip() else {}
        except _json.JSONDecodeError:
            return True

    def walk(node) -> bool:
        if node is True or node == {} or node is None:
            return True
        if not isinstance(node, dict):
            return False
        if "$ref" in node or "$defs" in node or "definitions" in node:
            return True
        if "additionalProperties" in node and \
                node["additionalProperties"] not in (False, ):
            return True
        t = node.get("type")
        if t in ("object", "array") and "properties" not in node and \
                "items" not in node and "enum" not in node and \
                "const" not in node:
            return True
        kids = []
        kids.extend((node.get("properties") or {}).values())
        if isinstance(node.get("items"), (dict, bool)):
            kids.append(node["items"])
        for key in ("anyOf", "oneOf", "allOf"):
            kids.extend(node.get(key) or [])
        if isinstance(t, list):
            return any(walk({**node, "type": x}) for x in t)
        return any(walk(k) for k in kids)

    return walk(schema)


def build_json_cfg_grammar(schema, tokenizer, vocab_size: int,
                           eos_token_id: Optional[int],
                           byte_table=None) -> PushdownGrammar:
    return build_ebnf_grammar(json_schema_to_gbnf(schema), tokenizer,
                              vocab_size, eos_token_id, byte_table)
