"""Logprobs + penalty sampling E2E."""

import math

import numpy as np
import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=2),
    )
    params = llama.random_params(cfg.model, seed=41)
    return cfg, params


def gen(cfg, params, sp, prompt=(1, 5, 9)):
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    engine.add_request(list(prompt), sp)
    out = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                out = o
    return out


def test_logprobs_returned(setup):
    cfg, params = setup
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                        logprobs=3)
    out = gen(cfg, params, sp)
    c = out.outputs[0]
    assert c.logprobs is not None and len(c.logprobs) == 5
    for tok, lp in zip(c.token_ids, c.logprobs):
        assert tok in lp
        assert lp[tok] <= 0.0
        # greedy token must be the highest-logprob entry
        assert lp[tok] == max(lp.values())
        assert len(lp) >= 3
    assert c.cumulative_logprob is not None
    assert math.isclose(c.cumulative_logprob,
                        sum(lp[t] for lp, t in zip(c.logprobs,
                                                   c.token_ids)),
                        rel_tol=1e-6)


def test_logprobs_off_by_default(setup):
    cfg, params = setup
    out = gen(cfg, params,
              SamplingParams(temperature=0.0, max_tokens=3,
                             ignore_eos=True))
    assert out.outputs[0].logprobs is None


def test_repetition_penalty_reduces_repeats(setup):
    cfg, params = setup
    base = gen(cfg, params,
               SamplingParams(temperature=0.0, max_tokens=24,
                              ignore_eos=True))
    pen = gen(cfg, params,
              SamplingParams(temperature=0.0, max_tokens=24,
                             ignore_eos=True, repetition_penalty=1.8))
    def distinct(toks):
        return len(set(toks))
    # strong repetition penalty must increase diversity on a looping
    # random model
    assert distinct(pen.outputs[0].token_ids) >= \
        distinct(base.outputs[0].token_ids)
    assert pen.outputs[0].token_ids != base.outputs[0].token_ids


def test_frequency_penalty_changes_output(setup):
    cfg, params = setup
    base = gen(cfg, params,
               SamplingParams(temperature=0.0, max_tokens=16,
                              ignore_eos=True))
    pen = gen(cfg, params,
              SamplingParams(temperature=0.0, max_tokens=16,
                             ignore_eos=True, frequency_penalty=2.0))
    assert pen.outputs[0].token_ids != base.outputs[0].token_ids
