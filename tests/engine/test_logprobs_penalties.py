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


def test_logit_bias_forces_token(setup):
    """OpenAI logit_bias: a large positive bias makes the token win
    every step; a large negative bias bans it (ref: vllm logit_bias
    logits processor semantics)."""
    cfg, params = setup
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                        logit_bias={42: 100.0})
    out = gen(cfg, params, sp)
    assert out.outputs[0].token_ids == [42] * 5

    base = gen(cfg, params,
               SamplingParams(temperature=0.0, max_tokens=5,
                              ignore_eos=True))
    banned = set(base.outputs[0].token_ids)
    sp2 = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                         logit_bias={t: -100.0 for t in banned})
    out2 = gen(cfg, params, sp2)
    assert not (set(out2.outputs[0].token_ids) & banned)


def test_prompt_logprobs_match_teacher_forcing(setup):
    """prompt_logprobs: entry 0 is None; every other entry carries the
    actual prompt token's logprob and the requested top-k; values match
    an independent forward pass."""
    import jax.numpy as jnp

    from vllm_tpu.ops.kv_cache import kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    cfg, params = setup
    prompt = [1, 5, 9, 22, 7, 33, 90, 2, 64, 17]
    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                        prompt_logprobs=2)
    out = gen(cfg, params, sp, prompt=tuple(prompt))
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(prompt)
    assert plp[0] is None
    for pos in range(1, len(prompt)):
        entry = plp[pos]
        assert prompt[pos] in entry  # actual token always present
        assert len(entry) >= 2

    # Independent teacher-forced reference.
    import jax
    T = len(prompt)
    caches = [
        jnp.zeros(kv_cache_shape(8, 16, cfg.model.num_kv_heads,
                                 cfg.model.head_dim), jnp.float32)
        for _ in range(cfg.model.num_layers)
    ]
    meta = AttentionMetadata(
        slot_mapping=jnp.arange(16, 16 + T, dtype=jnp.int32),
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
    )
    hidden, _ = llama.forward(params, cfg.model,
                              jnp.asarray(prompt, jnp.int32),
                              jnp.arange(T, dtype=jnp.int32), caches,
                              meta)
    logits = llama.compute_logits(params, cfg.model, hidden)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for pos in range(1, len(prompt)):
        want = float(logp[pos - 1, prompt[pos]])
        got = plp[pos][prompt[pos]]
        assert math.isclose(got, want, rel_tol=1e-3, abs_tol=1e-4), (
            pos, got, want)


def test_prompt_logprobs_chunked_prefill(setup):
    """Chunked prefill accumulates the same prompt logprobs."""
    cfg, params = setup
    import dataclasses
    cfg_small = dataclasses.replace(
        cfg, scheduler=dataclasses.replace(
            cfg.scheduler, max_num_batched_tokens=8))
    prompt = tuple((i * 7 + 1) % 100 for i in range(20))
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                        prompt_logprobs=1)
    a = gen(cfg, params, sp, prompt=prompt)
    b = gen(cfg_small, params, sp, prompt=prompt)
    assert a.prompt_logprobs is not None
    assert len(a.prompt_logprobs) == len(b.prompt_logprobs) == 20
    for ea, eb in zip(a.prompt_logprobs[1:], b.prompt_logprobs[1:]):
        assert set(ea) == set(eb)
        for t in ea:
            assert math.isclose(ea[t], eb[t], rel_tol=1e-3,
                                abs_tol=1e-4)
