"""CFG (EBNF -> pushdown) structured-output tests.

Covers what the regex backend cannot: recursion and unbounded nesting
(ref analog: tests around backend_xgrammar.py — guided_grammar EBNF and
recursive JSON schemas)."""

import json

import numpy as np
import pytest

from vllm_tpu.structured_output.cfg import (GrammarError, PushdownGrammar,
                                            compile_gbnf,
                                            json_schema_to_gbnf,
                                            schema_needs_cfg)

BALANCED = """
root ::= expr
expr ::= "(" expr ")" | "x"
"""

JSON_GBNF = json_schema_to_gbnf(None)  # any-JSON grammar


def _accepts(rtn_text: str, data: bytes) -> bool:
    class _NoTok:  # byte_table passed explicitly; tokenizer unused
        pass

    g = PushdownGrammar(
        compile_gbnf(rtn_text), None, 1,
        eos_token_id=None,
        byte_table=(np.zeros((1, 1), np.uint8), np.zeros(1, np.int32)))
    state = g._walk(g.ROOT, data)
    return bool(state) and g.ACCEPT in state


class TestGbnfPushdown:

    def test_balanced_parens(self):
        for depth in (0, 1, 5, 40):
            s = b"(" * depth + b"x" + b")" * depth
            assert _accepts(BALANCED, s), depth
        assert not _accepts(BALANCED, b"((x)")
        assert not _accepts(BALANCED, b"(x))")
        assert not _accepts(BALANCED, b"")
        assert not _accepts(BALANCED, b"xx")

    def test_terminals_classes_reps(self):
        g = """
        root ::= "ab" [0-9]{2,3} ("-" [a-z]+)?
        """
        assert _accepts(g, b"ab12")
        assert _accepts(g, b"ab123-zz")
        assert not _accepts(g, b"ab1")
        assert not _accepts(g, b"ab1234")
        assert not _accepts(g, b"ab12-")

    def test_alternation_and_star(self):
        g = 'root ::= ("a" | "bc")* "!"'
        for ok in (b"!", b"a!", b"bca!", b"aabc!"):
            assert _accepts(g, ok), ok
        for bad in (b"", b"b!", b"a"):
            assert not _accepts(g, bad), bad

    def test_errors(self):
        with pytest.raises(GrammarError):
            compile_gbnf("foo ::= \"a\"")  # no root
        with pytest.raises(GrammarError):
            compile_gbnf("root ::= undefined-rule")
        with pytest.raises(GrammarError):
            compile_gbnf("root ::= (\"a\"")

    def test_any_json_grammar(self):
        good = [None, True, 0, -3.5, "hi", [], [1, [2, [3]]],
                {"a": {"b": {"c": [1, "x", {"d": []}]}}}]
        for v in good:
            data = json.dumps(v, separators=(",", ":")).encode()
            assert _accepts(JSON_GBNF, data), v
        for bad in (b"{", b"[1,]", b'{"a":}', b"01", b"+1", b"'x'"):
            assert not _accepts(JSON_GBNF, bad), bad


class TestSchemaToGbnf:

    def _check(self, schema, good, bad):
        text = json_schema_to_gbnf(schema)
        for v in good:
            data = json.dumps(v, separators=(",", ":")).encode()
            assert _accepts(text, data), (text, v)
        for v in bad:
            data = json.dumps(v, separators=(",", ":")).encode()
            assert not _accepts(text, data), (text, v)

    def test_recursive_ref(self):
        schema = {
            "$ref": "#/$defs/tree",
            "$defs": {
                "tree": {
                    "type": "object",
                    "properties": {
                        "v": {"type": "integer"},
                        "kids": {"type": "array",
                                 "items": {"$ref": "#/$defs/tree"}},
                    },
                    "required": ["v"],
                },
            },
        }
        deep = {"v": 1, "kids": [{"v": 2, "kids": [{"v": 3}]}]}
        self._check(schema, [{"v": 0}, deep],
                    [{"kids": []}, {"v": "x"}, {"v": 1, "kids": [1]}])

    def test_self_recursion_via_root_ref(self):
        schema = {
            "type": "object",
            "properties": {"next": {"anyOf": [{"type": "null"},
                                              {"$ref": "#"}]}},
            "required": ["next"],
        }
        self._check(schema,
                    [{"next": None}, {"next": {"next": {"next": None}}}],
                    [{"next": 1}, {}])

    def test_open_object_and_any(self):
        self._check({"type": "object"},
                    [{}, {"a": 1, "b": [True, None]}], [[1], "x"])
        self._check({}, [1, "s", [{"k": "v"}]], [])
        self._check({"type": "object", "additionalProperties":
                     {"type": "integer"}},
                    [{}, {"a": 1, "b": 2}], [{"a": "x"}])

    def test_needs_cfg_routing(self):
        assert schema_needs_cfg(None)
        assert schema_needs_cfg({})
        assert schema_needs_cfg({"type": "object"})
        assert schema_needs_cfg({"$ref": "#/$defs/x", "$defs":
                                 {"x": {"type": "integer"}}})
        assert schema_needs_cfg(
            {"type": "object",
             "additionalProperties": {"type": "string"}})
        assert not schema_needs_cfg({"type": "integer"})
        assert not schema_needs_cfg(
            {"type": "object",
             "properties": {"a": {"type": "string"}}})


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from tests.engine.utils import build_tiny_tokenizer
    from vllm_tpu.engine.tokenizer import Tokenizer
    path = str(tmp_path_factory.mktemp("tok_cfg"))
    build_tiny_tokenizer(path)
    return Tokenizer(path)


class TestTokenLift:

    def _grammar(self, tok, text):
        from vllm_tpu.structured_output.cfg import build_ebnf_grammar
        return build_ebnf_grammar(text, tok, tok.vocab_size,
                                  tok.eos_token_id)

    def test_mask_matches_exact_walk(self, tok):
        g = self._grammar(tok, BALANCED)
        # At ROOT both "(" and "x" lead somewhere; ")" must not.
        packed = g.allowed_mask(g.ROOT)
        bits = np.unpackbits(packed.view(np.uint8), bitorder="little")
        allowed = set(np.nonzero(bits[:g.vocab_size])[0].tolist())
        # cross-check against brute-force exact walks
        for tid in list(allowed)[:64] + [t for t in range(g.vocab_size)
                                         if t not in allowed][:64]:
            exact = len(g._tok_bytes[tid]) > 0 and tid != g.eos \
                and bool(g._walk(g.ROOT, g._tok_bytes[tid]))
            assert (tid in allowed) == exact, tid

    def test_deep_nesting_masks(self, tok):
        g = self._grammar(tok, BALANCED)
        open_id = tok.encode("(", add_special_tokens=False)
        x_id = tok.encode("x", add_special_tokens=False)
        close_id = tok.encode(")", add_special_tokens=False)
        state = g.ROOT
        for _ in range(30):
            for t in open_id:
                state = g.advance(state, t)
                assert state is not None
        for t in x_id:
            state = g.advance(state, t)
        for _ in range(30):
            for t in close_id:
                state = g.advance(state, t)
                assert state is not None
        # balanced now: EOS must be allowed, "(" must not.
        packed = g.allowed_mask(state)
        bits = np.unpackbits(packed.view(np.uint8), bitorder="little")
        assert bits[g.eos] == 1
        assert g.is_exhausted(state)

    def test_eos_gating(self, tok):
        g = self._grammar(tok, 'root ::= "hi"')
        bits0 = np.unpackbits(
            g.allowed_mask(g.ROOT).view(np.uint8), bitorder="little")
        assert bits0[g.eos] == 0
        state = g.ROOT
        for t in tok.encode("hi", add_special_tokens=False):
            state = g.advance(state, t)
        bits1 = np.unpackbits(
            g.allowed_mask(state).view(np.uint8), bitorder="little")
        assert bits1[g.eos] == 1


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


def test_guided_grammar_e2e(engine_tok):
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    out = _run(
        engine, "p: ",
        SamplingParams(temperature=0.9, max_tokens=64, seed=3,
                       guided_grammar=BALANCED))
    text = out.text
    assert text.count("(") == text.count(")")
    assert text.strip("()") == "x" or text == "x", repr(text)


def test_guided_json_recursive_e2e(engine_tok):
    """The VERDICT r2 'done' bar: guided JSON with nested structures of
    unbounded depth generates valid output through the engine."""
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    schema = {
        "$ref": "#/$defs/node",
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"enum": [1, 2]},
                    "kids": {"type": "array",
                             "items": {"$ref": "#/$defs/node"},
                             "maxItems": 2},
                },
                "required": ["v"],
            },
        },
    }
    for seed in (5, 9):
        out = _run(
            engine, "j: ",
            SamplingParams(temperature=0.9, max_tokens=96, seed=seed,
                           guided_json=schema))
        value = json.loads(out.text)

        def check(n):
            assert n["v"] in (1, 2)
            for k in n.get("kids", []):
                check(k)

        check(value)
