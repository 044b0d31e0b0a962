"""Structured output: token-trie unit tests + E2E guided choice."""

import pytest

from vllm_tpu.structured_output.trie import (GrammarState,
                                             TokenTrieGrammar)


class TestTrie:

    def test_single_sequence(self):
        g = TokenTrieGrammar([[5, 6, 7]], eos_token_id=2)
        s = GrammarState(g)
        assert s.allowed_tokens() == [5]
        s.advance(5)
        assert s.allowed_tokens() == [6]
        s.advance(6)
        assert s.allowed_tokens() == [7]
        s.advance(7)
        assert s.allowed_tokens() == [2]  # only EOS at accept
        s.advance(2)
        assert not s.active

    def test_shared_prefix_branches(self):
        g = TokenTrieGrammar([[1, 2, 3], [1, 2, 9], [4]], eos_token_id=0)
        s = GrammarState(g)
        assert sorted(s.allowed_tokens()) == [1, 4]
        s.advance(1)
        assert s.allowed_tokens() == [2]
        s.advance(2)
        assert sorted(s.allowed_tokens()) == [3, 9]

    def test_prefix_choice_allows_continuation_and_eos(self):
        # "ab" and "abc": after ab, both EOS and c are legal.
        g = TokenTrieGrammar([[7, 8], [7, 8, 9]], eos_token_id=0)
        s = GrammarState(g)
        s.advance(7)
        s.advance(8)
        assert sorted(s.allowed_tokens()) == [0, 9]


def _engine_with_tokenizer(tmp_path_factory):
    from tests.engine.utils import build_tiny_tokenizer
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.engine.tokenizer import Tokenizer
    from vllm_tpu.models import llama

    path = str(tmp_path_factory.mktemp("tok_so"))
    build_tiny_tokenizer(path)
    tok = Tokenizer(path)
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=2048, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
    )
    cfg.model.eos_token_ids = [tok.eos_token_id]  # type: ignore[attr-defined]
    params = llama.random_params(cfg.model, seed=51)
    return LLMEngine(cfg, params=params, tokenizer=tok), tok


@pytest.fixture(scope="module")
def engine_tok(tmp_path_factory):
    return _engine_with_tokenizer(tmp_path_factory)


def test_guided_choice_e2e(engine_tok):
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    choices = ["Hello world", "The quick brown fox", "token"]
    outs = {}
    for i, temp in enumerate([0.0, 0.9]):
        rid = engine.add_request(
            "pick: ",
            SamplingParams(temperature=temp, max_tokens=16, seed=3,
                           guided_choice=list(choices)))
        outs[rid] = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0]
    for rid, c in outs.items():
        assert c is not None
        assert c.text in choices, repr(c.text)


def test_guided_choice_many_requests_different_choices(engine_tok):
    from vllm_tpu.sample.params import SamplingParams
    engine, tok = engine_tok
    table = {
        "a": ["Hello world"],
        "b": ["The quick brown fox", "token"],
    }
    rids = {}
    for name, ch in table.items():
        rid = engine.add_request(
            "x", SamplingParams(temperature=0.0, max_tokens=16,
                                guided_choice=ch))
        rids[rid] = ch
    done = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done[o.request_id] = o.outputs[0].text
    for rid, ch in rids.items():
        assert done[rid] in ch
