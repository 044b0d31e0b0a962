"""Stochastic rejection sampling for spec decode — device-side.

Distribution preservation is THE correctness property (ref:
vllm/v1/sample/rejection_sampler.py follows arXiv:2211.17192):

- point-mass proposals (ngram/greedy device drafts): accept draft d
  with probability p_target(d), else emit a sample from p_target
  masked at d (the reference's NO_DRAFT_PROBS branch);
- distribution proposals (EAGLE/MTP sampled drafts, q attached):
  accept with min(1, p(d)/q(d)), else emit from normalize(max(p-q,0)).

Both must emit tokens distributed exactly as p_target; the q-aware
rule must additionally ACCEPT MORE than the point-mass rule when the
drafter is good (that's the whole point of carrying draft probs).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig, SpeculativeConfig)
from vllm_tpu.sample.sampler import (SamplingMetadata,
                                     spec_rejection_outputs)


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


def _chi2_check(counts, expected_p, n, df_slack=0):
    """Pearson chi-square GoF at alpha ~ 1e-4 (generous critical
    values for the tiny dfs used here)."""
    expected = expected_p * n
    keep = expected > 5
    stat = float(np.sum((counts[keep] - expected[keep])**2
                        / expected[keep]))
    df = int(keep.sum()) - 1 - df_slack
    # chi2 inverse CDF at 1-1e-4 for df 1..15 (precomputed).
    crit = [15.1, 18.4, 21.1, 23.5, 25.7, 27.9, 29.9, 31.8, 33.7,
            35.6, 37.4, 39.1, 40.9, 42.6, 44.3]
    assert stat < crit[min(df, 15) - 1], (stat, df, counts, expected)


def test_distribution_preserved_point_mass(cpu_devices):
    """First-emitted-token histogram under the q=1 rule == target."""
    V, K1 = 8, 2
    rng = np.random.default_rng(0)
    logits_row = rng.standard_normal(V).astype(np.float32) * 1.5
    p = np.exp(logits_row) / np.exp(logits_row).sum()
    draft = int(np.argmax(p))  # propose the mode (worst case for bias)

    R = 4096
    logits = jnp.asarray(np.tile(logits_row, (R, K1, 1)))
    draft_targets = np.full((R, K1), -1, np.int32)
    draft_targets[:, 0] = draft  # one draft, column K-1 = 0
    bonus = jnp.zeros((R, ), jnp.int32)
    meta = make_meta(R, seeds=np.arange(R), steps=np.zeros(R))
    tokens, n_new = jax.jit(spec_rejection_outputs)(
        logits, jnp.asarray(draft_targets), None, bonus, meta)
    first = np.asarray(tokens)[:, 0]
    assert np.all(np.asarray(n_new) >= 1)

    counts = np.bincount(first, minlength=V).astype(np.float64)
    _chi2_check(counts, p, R)
    # Rejected rows' recovery sample never equals the draft.
    rejected = np.asarray(n_new) == 1
    acc = first == draft
    assert np.all(acc | (first != draft))


def test_distribution_preserved_draft_probs_chi2(cpu_devices):
    """VERDICT r3 item 5: with drafts SAMPLED from q and the p/q
    accept rule + residual recovery, the emitted token is distributed
    exactly as p (chi-square test on a tiny vocab)."""
    V, K1 = 6, 2
    rng = np.random.default_rng(3)
    logits_row = rng.standard_normal(V).astype(np.float32)
    p = np.exp(logits_row) / np.exp(logits_row).sum()
    q = np.roll(p, 1)  # deliberately offset draft distribution

    R = 8192
    drafts = rng.choice(V, size=R, p=q).astype(np.int32)
    logits = jnp.asarray(np.tile(logits_row, (R, K1, 1)))
    draft_targets = np.full((R, K1), -1, np.int32)
    draft_targets[:, 0] = drafts
    draft_probs = jnp.asarray(np.tile(q.astype(np.float32),
                                      (R, 1, 1)))  # [R, 1, V]
    bonus = jnp.zeros((R, ), jnp.int32)
    meta = make_meta(R, seeds=np.arange(R), steps=np.zeros(R))
    tokens, n_new = jax.jit(spec_rejection_outputs)(
        logits, jnp.asarray(draft_targets), draft_probs, bonus, meta)
    first = np.asarray(tokens)[:, 0]
    counts = np.bincount(first, minlength=V).astype(np.float64)
    _chi2_check(counts, p, R)


def test_ratio_rule_accepts_more_than_point_mass(cpu_devices):
    """When the drafter matches the target (q == p), the p/q rule
    accepts ~always while the point-mass rule accepts with prob
    E[p(d)] < 1 — carrying draft probs must raise acceptance."""
    V, K1 = 16, 2
    rng = np.random.default_rng(7)
    logits_row = rng.standard_normal(V).astype(np.float32)
    p = np.exp(logits_row) / np.exp(logits_row).sum()

    R = 4096
    drafts = rng.choice(V, size=R, p=p).astype(np.int32)
    logits = jnp.asarray(np.tile(logits_row, (R, K1, 1)))
    draft_targets = np.full((R, K1), -1, np.int32)
    draft_targets[:, 0] = drafts
    bonus = jnp.zeros((R, ), jnp.int32)
    meta = make_meta(R, seeds=np.arange(R), steps=np.zeros(R))

    q_probs = jnp.asarray(np.tile(p.astype(np.float32), (R, 1, 1)))
    _, n_ratio = jax.jit(spec_rejection_outputs)(
        logits, jnp.asarray(draft_targets), q_probs, bonus, meta)
    _, n_pm = jax.jit(
        lambda l, d, b, m: spec_rejection_outputs(l, d, None, b, m))(
            logits, jnp.asarray(draft_targets), bonus, meta)
    # n_new == 2 means the draft was accepted (draft + bonus).
    acc_ratio = float(np.mean(np.asarray(n_ratio) == 2))
    acc_pm = float(np.mean(np.asarray(n_pm) == 2))
    assert acc_ratio > 0.99, acc_ratio  # q == p: accept ratio ~ 1
    assert acc_pm < 0.5, acc_pm  # E[p(d)] for this p is well below 1
    assert acc_ratio > acc_pm + 0.3


def test_draft_outside_topk_rejected(cpu_devices):
    """A draft outside the row's top-k must be rejected (p(d) == 0)
    and the recovery sample must come from the top-k."""
    V = 16
    logits_row = np.linspace(0, 3, V).astype(np.float32)
    R = 64
    K1 = 2
    logits = jnp.asarray(np.tile(logits_row, (R, K1, 1)))
    worst = int(np.argmin(logits_row))
    draft_targets = np.full((R, K1), -1, np.int32)
    draft_targets[:, 0] = worst
    bonus = jnp.zeros((R, ), jnp.int32)
    meta = make_meta(R)._replace(top_k=jnp.full((R, ), 2, jnp.int32))
    tokens, n_new = spec_rejection_outputs(
        logits, jnp.asarray(draft_targets), None, bonus, meta)
    assert np.all(np.asarray(n_new) == 1)  # always rejected
    assert np.all(np.asarray(tokens)[:, 0] >= V - 2)  # top-2 recovery


def test_multi_draft_prefix_acceptance(cpu_devices):
    """With K=3 drafts, emitted tokens are an accepted prefix + one
    recovery-or-bonus, never more; accepted positions echo drafts."""
    V, K = 8, 3
    R = 2048
    rng = np.random.default_rng(1)
    logits = jnp.asarray(
        rng.standard_normal((R, K + 1, V)).astype(np.float32))
    draft_targets = np.full((R, K + 1), -1, np.int32)
    d = rng.integers(0, V, (R, K)).astype(np.int32)
    draft_targets[:, :K] = d
    bonus = jnp.full((R, ), V - 1, jnp.int32)
    meta = make_meta(R, seeds=np.arange(R), steps=np.zeros(R))
    tokens, n_new = jax.jit(spec_rejection_outputs)(
        logits, jnp.asarray(draft_targets), None, bonus, meta)
    tokens, n_new = np.asarray(tokens), np.asarray(n_new)
    assert np.all((n_new >= 1) & (n_new <= K + 1))
    for r in range(0, R, 97):
        n = n_new[r]
        # all but the last emitted token must equal the drafts
        assert list(tokens[r, :n - 1]) == list(d[r, :n - 1])
        if n == K + 1:
            assert tokens[r, K] == V - 1  # bonus rides last


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
