"""Ngram proposer unit tests + E2E spec-decode correctness.

The E2E invariant (ref analog: spec-decode acceptance tests): greedy
generation WITH speculative decoding must produce byte-identical tokens
to generation WITHOUT it — acceptance only ever skips forward on exact
matches.
"""

import numpy as np
import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig, SpeculativeConfig)
from vllm_tpu.spec_decode.ngram import NgramProposer


def make_proposer(k=4, min_n=2, max_n=4):
    return NgramProposer(
        SpeculativeConfig(method="ngram", num_speculative_tokens=k,
                          prompt_lookup_min=min_n, prompt_lookup_max=max_n))


class TestProposer:

    def test_simple_repeat(self):
        p = make_proposer()
        # trailing [5, 6] occurred earlier, followed by 7, 8, 9
        toks = [5, 6, 7, 8, 9, 1, 2, 5, 6]
        assert p.propose(toks) == [7, 8, 9, 1]

    def test_longest_ngram_wins(self):
        p = make_proposer(k=2, min_n=2, max_n=3)
        # [4,5,6] (n=3) matches at 0 -> follow [7,8]; the n=2 match of
        # [5,6] at 1 would give the same here, but a competing later
        # 2-gram must not shadow the 3-gram.
        toks = [4, 5, 6, 7, 8, 0, 5, 6, 9, 4, 5, 6]
        assert p.propose(toks) == [7, 8]

    def test_latest_occurrence_preferred(self):
        p = make_proposer(k=1, min_n=2, max_n=2)
        toks = [1, 2, 3, 1, 2, 4, 1, 2]
        # matches at 0 (-> 3) and 3 (-> 4); latest wins.
        assert p.propose(toks) == [4]

    def test_no_match(self):
        p = make_proposer()
        assert p.propose([1, 2, 3, 4, 5, 6]) == []

    def test_too_short(self):
        p = make_proposer()
        assert p.propose([1, 2]) == []

    def test_draft_shorter_than_k_at_boundary(self):
        p = make_proposer(k=4, min_n=2, max_n=2)
        toks = [7, 8, 9, 7, 8]
        # follow of match at 0 is just [9, 7, 8] (3 tokens < k)
        assert p.propose(toks) == [9, 7, 8]


def run_engine(spec: bool, prompt, max_tokens=24):
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=256,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4,
                                  multi_step_decode_horizon=1),
        speculative=SpeculativeConfig(
            method="ngram" if spec else None, num_speculative_tokens=3),
    )
    params = llama.random_params(cfg.model, seed=11)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    rid = engine.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=max_tokens,
                               ignore_eos=True))
    steps = 0
    toks = None
    while engine.has_unfinished_requests():
        steps += 1
        for o in engine.step():
            if o.finished:
                toks = o.outputs[0].token_ids
    return toks, steps


class TestE2E:

    def test_spec_matches_baseline_exactly(self):
        # A small-vocab random model loops quickly -> ngram hits.
        prompt = [1, 2, 3, 4, 5, 1, 2, 3, 4, 5]
        base, base_steps = run_engine(False, prompt)
        spec, spec_steps = run_engine(True, prompt)
        assert spec == base
        # With a 128-vocab random model the output usually cycles;
        # spec decode must never need MORE engine steps.
        assert spec_steps <= base_steps

    def test_spec_with_multiple_requests(self):
        from vllm_tpu.engine.llm_engine import LLMEngine
        from vllm_tpu.models import llama
        from vllm_tpu.sample.params import SamplingParams
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=64, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=65),
            scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                      max_num_seqs=4),
            speculative=SpeculativeConfig(method="ngram",
                                          num_speculative_tokens=3),
        )
        params = llama.random_params(cfg.model, seed=12)

        def gen(spec_cfg):
            cfg.speculative = spec_cfg
            engine = LLMEngine(cfg, params=params, tokenizer=None)
            rids = [
                engine.add_request([1 + i, 9, 1 + i, 9, 5],
                                   SamplingParams(temperature=0.0,
                                                  max_tokens=16,
                                                  ignore_eos=True))
                for i in range(3)
            ]
            done = {}
            while engine.has_unfinished_requests():
                for o in engine.step():
                    if o.finished:
                        done[o.request_id] = o.outputs[0].token_ids
            return [done[r] for r in rids]

        base = gen(SpeculativeConfig(method=None))
        spec = gen(SpeculativeConfig(method="ngram",
                                     num_speculative_tokens=3))
        assert spec == base
