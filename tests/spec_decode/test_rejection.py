"""Stochastic rejection sampling for spec decode.

Distribution preservation is THE correctness property (ref:
vllm/v1/sample/rejection_sampler.py follows arXiv:2211.17192): with a
deterministic proposal (ngram draft, draft prob == 1), accepting draft
d with probability p_target(d) and otherwise emitting a sample from
p_target masked at d emits tokens distributed exactly as p_target.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig, SpeculativeConfig)
from vllm_tpu.sample.sampler import SamplingMetadata, spec_verify_outputs


def make_meta(R, temperature=1.0, seeds=None, steps=None):
    return SamplingMetadata(
        temperature=jnp.full((R, ), temperature, jnp.float32),
        top_k=jnp.zeros((R, ), jnp.int32),
        top_p=jnp.ones((R, ), jnp.float32),
        min_p=jnp.zeros((R, ), jnp.float32),
        seeds=jnp.asarray(seeds if seeds is not None else np.arange(R),
                          jnp.int32),
        steps=jnp.asarray(steps if steps is not None else np.zeros(R),
                          jnp.int32),
    )


def test_distribution_preserved(cpu_devices):
    """First-emitted-token histogram under the accept rule == target."""
    V, K1 = 8, 2
    rng = np.random.default_rng(0)
    logits_row = rng.standard_normal(V).astype(np.float32) * 1.5
    p = np.exp(logits_row) / np.exp(logits_row).sum()
    draft = int(np.argmax(p))  # propose the mode (worst case for bias)

    # Batch many rows = many independent trials of the same position.
    R = 4096
    logits = jnp.asarray(np.tile(logits_row, (R, K1, 1)))
    draft_targets = jnp.full((R, K1), draft, jnp.int32)
    meta = make_meta(R, seeds=np.arange(R), steps=np.zeros(R))
    tgt_prob, recovered = jax.jit(spec_verify_outputs)(
        logits, draft_targets, meta)
    tgt_prob = np.asarray(tgt_prob)[:, 0]
    recovered = np.asarray(recovered)[:, 0]

    # Host accept rule, one uniform per row.
    u = np.random.default_rng(1).random(R)
    emitted = np.where(u < tgt_prob, draft, recovered)

    counts = np.bincount(emitted, minlength=V) / R
    # Each bin within 4 sigma of its binomial std.
    for t in range(V):
        sigma = np.sqrt(p[t] * (1 - p[t]) / R)
        assert abs(counts[t] - p[t]) < 4 * sigma + 1e-3, (
            t, counts[t], p[t])
    # Recovered samples never equal the draft.
    assert not np.any(recovered == draft)


def test_tgt_prob_respects_topk(cpu_devices):
    """A draft outside the row's top-k must have acceptance prob 0."""
    V = 16
    logits_row = np.linspace(0, 3, V).astype(np.float32)
    R = 4
    logits = jnp.asarray(np.tile(logits_row, (R, 1, 1)))
    worst = int(np.argmin(logits_row))
    draft_targets = jnp.full((R, 1), worst, jnp.int32)
    meta = make_meta(R)._replace(top_k=jnp.full((R, ), 2, jnp.int32))
    tgt_prob, recovered = spec_verify_outputs(logits, draft_targets, meta)
    assert np.allclose(np.asarray(tgt_prob), 0.0)
    # Recovered tokens come from the top-2 only.
    assert np.all(np.asarray(recovered) >= V - 2)


def run_sampled_spec(seed_params, req_seed, spec: bool):
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
    params = llama.random_params(cfg.model, seed=seed_params)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    cfg.model.eos_token_ids = []  # type: ignore[attr-defined]
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]  # ngram-friendly
    rid = engine.add_request(
        prompt,
        SamplingParams(temperature=0.9, max_tokens=20, ignore_eos=True,
                       seed=req_seed))
    toks = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                toks = o.outputs[0].token_ids
    return toks


def test_sampled_spec_e2e(cpu_devices):
    """temp>0 requests now get drafts and finish with exact counts."""
    toks = run_sampled_spec(11, req_seed=7, spec=True)
    assert toks is not None and len(toks) == 20
    # Determinism: same engine/seed -> identical sampled stream.
    toks2 = run_sampled_spec(11, req_seed=7, spec=True)
    assert toks == toks2
