"""Regex->DFA, JSON-schema->regex, and token-FSM tests.

The e2e tests drive the real engine with guided_regex / guided_json
(ref analog: tests/v1/entrypoints -- guided decoding e2e; here
backendless, our own FSM engine)."""

import json
import re

import numpy as np
import pytest

from vllm_tpu.structured_output.json_schema import build_regex_from_schema
from vllm_tpu.structured_output.regex_dfa import (RegexError, compile_regex)
from vllm_tpu.structured_output.trie import GrammarState


class TestRegexDFA:

    CASES = [
        ("abc", ["abc"], ["ab", "abcd", ""]),
        ("a*", ["", "a", "aaaa"], ["b", "ab"]),
        ("a+b?", ["a", "ab", "aab"], ["", "b", "abb"]),
        (r"\d{2,4}", ["12", "123", "1234"], ["1", "12345", "ab"]),
        ("(ab|cd)+", ["ab", "cdab"], ["", "a", "abc"]),
        (r"[a-c]x[^0-9]", ["axz", "bx!"], ["dxz", "ax1", "ax"]),
        (r"-?(0|[1-9]\d*)(\.\d+)?", ["0", "-17", "3.14"],
         ["00", "1.", "--1", "+1"]),
        (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org"],
         ["a@b", "a@b.net", "@b.com"]),
        ("héllo", ["héllo"], ["hello", "h"]),
        (r"a.c", ["abc", "a!c"], ["a\nc", "ac"]),
    ]

    @pytest.mark.parametrize("pattern,good,bad", CASES)
    def test_fullmatch_parity(self, pattern, good, bad):
        dfa = compile_regex(pattern)
        for s in good:
            assert dfa.fullmatch(s.encode()), (pattern, s)
            assert re.fullmatch(pattern, s), (pattern, s)
        for s in bad:
            assert not dfa.fullmatch(s.encode()), (pattern, s)

    def test_errors(self):
        for bad in ["(a", "a)", "[abc", "*a"]:
            with pytest.raises(RegexError):
                compile_regex(bad)

    def test_state_walk_incremental(self):
        dfa = compile_regex(r"ab*c")
        s = dfa.walk(0, b"ab")
        assert s >= 0 and not dfa.accepting[s]
        s2 = dfa.walk(s, b"bbc")
        assert s2 >= 0 and dfa.accepting[s2]
        assert dfa.walk(0, b"x") == -1


class TestJsonSchemaRegex:

    def _check(self, schema, good, bad):
        pattern = build_regex_from_schema(schema)
        for v in good:
            text = json.dumps(v, separators=(",", ":"))
            assert re.fullmatch(pattern, text), (pattern, text)
        for v in bad:
            text = json.dumps(v, separators=(",", ":"))
            assert not re.fullmatch(pattern, text), (pattern, text)

    def test_scalars(self):
        self._check({"type": "integer"}, [0, -5, 123], [1.5, "x", True])
        self._check({"type": "number"}, [0, -1.5, 2e3], ["x", None])
        self._check({"type": "boolean"}, [True, False], [0, "true"])
        self._check({"type": "string"}, ["", "hi", 'a"b'], [1, None])

    def test_enum_const(self):
        self._check({"enum": ["a", "b", 3]}, ["a", "b", 3], ["c", 4])
        self._check({"const": {"k": 1}}, [{"k": 1}], [{"k": 2}])

    def test_object_required_and_optional(self):
        schema = {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
                "tag": {"type": "string"},
            },
            "required": ["name", "age"],
        }
        self._check(schema, [{"name": "x", "age": 3},
                             {"name": "x", "age": 3, "tag": "t"}],
                    [{"name": "x"}, {"age": 3}])

    def test_array_bounds(self):
        schema = {"type": "array", "items": {"type": "integer"},
                  "minItems": 1, "maxItems": 3}
        self._check(schema, [[1], [1, 2, 3]], [[], [1, 2, 3, 4], ["a"]])
        self._check({"type": "array", "items": {"type": "boolean"}},
                    [[], [True], [True, False]], [[1]])

    def test_anyof_nested(self):
        schema = {
            "type": "object",
            "properties": {
                "v": {"anyOf": [{"type": "integer"}, {"type": "null"}]},
            },
            "required": ["v"],
        }
        self._check(schema, [{"v": 1}, {"v": None}], [{"v": "x"}])

    def test_dfa_compiles_object_schema(self):
        schema = {
            "type": "object",
            "properties": {"a": {"type": "integer"},
                           "b": {"type": "string"}},
            "required": ["a", "b"],
        }
        dfa = compile_regex(build_regex_from_schema(schema))
        assert dfa.fullmatch(b'{"a":-12,"b":"hi"}')
        assert not dfa.fullmatch(b'{"a":1.5,"b":"hi"}')
        assert not dfa.fullmatch(b'{"b":"hi","a":1}')  # fixed key order


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from tests.engine.utils import build_tiny_tokenizer
    from vllm_tpu.engine.tokenizer import Tokenizer
    path = str(tmp_path_factory.mktemp("tok_fsm"))
    build_tiny_tokenizer(path)
    return Tokenizer(path)


class TestTokenFSM:

    def _grammar(self, tok, pattern):
        from vllm_tpu.structured_output.token_fsm import \
            build_regex_grammar
        return build_regex_grammar(pattern, tok, tok.vocab_size,
                                   tok.eos_token_id)

    def test_token_bytes_roundtrip(self, tok):
        from vllm_tpu.structured_output.token_fsm import token_bytes_table
        table = token_bytes_table(tok, tok.vocab_size)
        ids = tok.encode("Hello world 123", add_special_tokens=False)
        text = b"".join(table[i] for i in ids).decode()
        assert text == "Hello world 123"

    def test_greedy_walk_matches(self, tok):
        g = self._grammar(tok, r"Hello world")
        state, emitted = g.ROOT, b""
        from vllm_tpu.structured_output.token_fsm import token_bytes_table
        table = token_bytes_table(tok, tok.vocab_size)
        for _ in range(20):
            allowed = g.allowed_tokens(state)
            assert allowed, "dead state reached"
            if tok.eos_token_id in allowed and emitted == b"Hello world":
                break
            cand = [t for t in allowed if t != tok.eos_token_id]
            # pick the longest-byte token (greedy BPE-ish)
            nxt = max(cand, key=lambda t: len(table[t]))
            emitted += table[nxt]
            state = g.advance(state, nxt)
            assert state is not None
        assert emitted == b"Hello world"

    def test_mask_matches_allowed_tokens(self, tok):
        g = self._grammar(tok, r"[0-9]+")
        packed = g.allowed_mask(g.ROOT)
        unpacked = np.unpackbits(packed.view(np.uint8),
                                 bitorder="little")[:tok.vocab_size]
        assert set(np.nonzero(unpacked)[0]) == set(
            g.allowed_tokens(g.ROOT))
        # digits allowed at root, EOS not (nothing matched yet)
        some_digit = tok.encode("7", add_special_tokens=False)[-1]
        assert unpacked[some_digit]
        assert not unpacked[tok.eos_token_id]

    def test_eos_only_after_accept(self, tok):
        g = self._grammar(tok, r"ok")
        seq = tok.encode("ok", add_special_tokens=False)
        state = g.ROOT
        for t in seq:
            assert t in g.allowed_tokens(state)
            state = g.advance(state, t)
        assert tok.eos_token_id in g.allowed_tokens(state)

    def test_grammar_state_packed_protocol(self, tok):
        g = self._grammar(tok, r"[ab]{2}")
        s = GrammarState(g)
        packed = s.allowed_mask_packed(tok.vocab_size)
        assert packed.dtype == np.uint32
        a = tok.encode("a", add_special_tokens=False)[-1]
        s.advance(a)
        assert s.active
        s.advance(a)
        # two chars consumed -> accepting; EOS advance finishes
        s.advance(tok.eos_token_id)
        assert not s.active


@pytest.fixture(scope="module")
def engine_tok(tmp_path_factory):
    from tests.structured_output.test_guided_choice import \
        _engine_with_tokenizer
    return _engine_with_tokenizer(tmp_path_factory)


def _run(engine, prompt, params):
    rid = engine.add_request(prompt, params)
    out = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                out = o.outputs[0]
    assert out is not None
    return out


def test_guided_regex_e2e(engine_tok):
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    pattern = r"(Hello|token) (world|fox)"
    for temp in (0.0, 0.8):
        out = _run(
            engine, "say: ",
            SamplingParams(temperature=temp, max_tokens=24, seed=7,
                           guided_regex=pattern))
        assert re.fullmatch(pattern, out.text), repr(out.text)


def test_guided_json_e2e(engine_tok):
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    schema = {
        "type": "object",
        "properties": {
            "word": {"enum": ["fox", "dog"]},
            "num": {"type": "integer"},
        },
        "required": ["word", "num"],
    }
    out = _run(
        engine, "json: ",
        SamplingParams(temperature=0.9, max_tokens=48, seed=11,
                       guided_json=schema))
    value = json.loads(out.text)
    assert value["word"] in ("fox", "dog")
    assert isinstance(value["num"], int)


def test_guided_json_string_schema_cached(engine_tok):
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    schema = json.dumps({"type": "boolean"})
    out1 = _run(engine, "b: ", SamplingParams(temperature=0.0,
                                              max_tokens=8,
                                              guided_json=schema))
    out2 = _run(engine, "c: ", SamplingParams(temperature=0.0,
                                              max_tokens=8,
                                              guided_json=schema))
    assert out1.text in ("true", "false")
    assert out2.text in ("true", "false")
    assert len(engine._grammar_cache) >= 1
