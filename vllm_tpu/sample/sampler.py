"""Device-side sampler: temperature / top-k / top-p / min-p with
seeded Gumbel-max sampling, plus penalties.

TPU-native translation of the reference sampler (ref: vllm/v1/sample/
sampler.py Sampler:20, ops/topk_topp_sampler.py, ops/penalties.py).
Model Runner V2's Gumbel-max design is already the right algorithm for
a stateless, per-request-seeded XLA sampler: argmax(logits/T + G) with
G ~ Gumbel(0,1) from a counter-based PRNG — no categorical sampling op,
no host sync, deterministic per (seed, step) (ref: vllm/v1/worker/gpu/
sample/ Gumbel-max sampler).

All inputs are fixed-shape [R, ...] arrays; inactive rows are padding
and their outputs are ignored host-side.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingMetadata(NamedTuple):
    """Per-row sampling controls (device arrays, [R] each)."""
    temperature: jax.Array  # f32; 0 == greedy
    top_k: jax.Array  # i32; 0 == disabled
    top_p: jax.Array  # f32; 1.0 == disabled
    min_p: jax.Array  # f32; 0.0 == disabled
    # Per-row PRNG seed (i32). Rows without a user seed get
    # engine_seed + row so streams differ.
    seeds: jax.Array
    # Monotonic per-row sampling-step counter: the Gumbel stream is
    # fold_in(seed, counter), so replaying a step reproduces it.
    steps: jax.Array  # i32


class PenaltyInputs(NamedTuple):
    """Per-row penalty controls + token statistics ([R, V] arrays are
    host-built only for steps where some request has penalties —
    ref analog: vllm/v1/sample/ops/penalties.py bin-count tensors)."""
    repetition: jax.Array  # [R] f32; 1.0 == disabled
    presence: jax.Array  # [R] f32
    frequency: jax.Array  # [R] f32
    out_counts: jax.Array  # [R, V] i32 output-token counts
    all_presence: jax.Array  # [R, V] bool prompt|output presence
    bias: jax.Array  # [R, V] f32 additive logit bias (OpenAI logit_bias)


def apply_penalties(logits: jax.Array, pen: PenaltyInputs) -> jax.Array:
    """vLLM semantics: repetition penalty over prompt+output tokens;
    presence/frequency over output tokens only."""
    rep = pen.repetition[:, None]
    scaled = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(pen.all_presence, scaled, logits)
    logits = logits - pen.frequency[:, None] * pen.out_counts
    logits = logits - pen.presence[:, None] * (pen.out_counts > 0)
    return logits + pen.bias


def _apply_top_k_top_p(logits: jax.Array, top_k: jax.Array,
                       top_p: jax.Array) -> jax.Array:
    """Mask logits outside top-k / nucleus top-p, per row.

    Threshold formulation: one descending sort yields (a) the k-th
    largest value and (b) the nucleus cutoff value; the keep mask is
    then two compares in vocab order — no argsort, no inverse-
    permutation scatter (both are compile- and run-time heavy on TPU).
    Ties at the threshold keep all tied tokens (float logits: measure
    zero; the reference's exact-rank semantics differ only there).
    Ref algorithm: vllm/v1/sample/ops/topk_topp_sampler.py.
    """
    R, V = logits.shape
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]

    # top-k threshold: value of the k-th largest (k==0 -> disabled).
    k = jnp.clip(jnp.where(top_k <= 0, V, top_k), 1, V)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    keep_k = logits >= kth

    # top-p threshold: smallest prefix of sorted probs with mass >= p;
    # the cutoff is the last sorted value whose *preceding* mass < p.
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    in_nucleus = cum_before < top_p[:, None]  # [R, V] prefix mask
    # Index of the last True (prefix is contiguous from 0).
    cutoff_idx = jnp.sum(in_nucleus.astype(jnp.int32), axis=-1) - 1
    cutoff_idx = jnp.clip(cutoff_idx, 0, V - 1)
    p_thresh = jnp.take_along_axis(sorted_desc, cutoff_idx[:, None],
                                   axis=-1)
    keep_p = logits >= p_thresh

    return jnp.where(keep_k & keep_p, logits, -jnp.inf)


def _apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    max_p = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= (min_p[:, None] * max_p)
    return jnp.where(keep | (min_p[:, None] <= 0.0), logits, -jnp.inf)


def _gumbel(seeds: jax.Array, steps: jax.Array, shape_v: int) -> jax.Array:
    """Per-row Gumbel(0,1) noise from counter-based PRNG."""

    def row_noise(seed, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        return jax.random.gumbel(key, (shape_v, ), jnp.float32)

    return jax.vmap(row_noise)(seeds, steps)


def sample(
    logits: jax.Array,  # [R, V] f32
    meta: SamplingMetadata,
) -> jax.Array:
    """Returns sampled token ids [R] int32.

    The random path (vocab sort for top-k/p + Gumbel noise) only
    executes when some row actually samples — all-greedy batches take
    the argmax-only branch at runtime (lax.cond on the batch).
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def random_path(_):
        temp = jnp.maximum(meta.temperature, 1e-6)[:, None]
        scaled = logits / temp
        scaled = _apply_top_k_top_p(scaled, meta.top_k, meta.top_p)
        scaled = _apply_min_p(scaled, meta.min_p)
        noise = _gumbel(meta.seeds, meta.steps, logits.shape[-1])
        random = jnp.argmax(scaled + noise, axis=-1).astype(jnp.int32)
        return jnp.where(meta.temperature <= 0.0, greedy, random)

    any_random = jnp.any(meta.temperature > 0.0)
    return jax.lax.cond(any_random, random_path, lambda _: greedy, None)


def spec_verify_outputs(
    logits: jax.Array,  # [R, K1, V] f32 (penalties/grammar applied)
    draft_targets: jax.Array,  # [R, K1] i32 draft token per column (-1 pad)
    meta: SamplingMetadata,
) -> tuple[jax.Array, jax.Array]:
    """Stochastic rejection-sampling support (ngram drafts: draft
    probability == 1). Returns per column j:

    - tgt_prob [R, K1]: target probability of the draft token under the
      row's processed distribution (temperature/top-k/top-p applied) —
      the host accepts draft j iff u_j < tgt_prob (ref:
      vllm/v1/sample/rejection_sampler.py rejection_random_sample_kernel,
      NO_DRAFT_PROBS branch).
    - recovered [R, K1]: a sample from the processed distribution with
      the draft token masked out (the "recovered" token emitted on the
      first rejection; ref: sample_recovered_tokens_kernel).

    The Gumbel stream is fold_in(row stream, 7919 + column) so recovered
    draws are independent of the bonus sample and replayable.
    """
    R, K1, V = logits.shape
    temp = jnp.maximum(meta.temperature, 1e-6)[:, None, None]
    scaled = logits / temp
    flat = scaled.reshape(R * K1, V)
    flat = _apply_top_k_top_p(flat, jnp.repeat(meta.top_k, K1),
                              jnp.repeat(meta.top_p, K1))
    flat = _apply_min_p(flat, jnp.repeat(meta.min_p, K1))
    probs = jax.nn.softmax(flat, axis=-1).reshape(R, K1, V)

    safe_targets = jnp.clip(draft_targets, 0, V - 1)
    tgt_prob = jnp.take_along_axis(probs, safe_targets[..., None],
                                   axis=-1)[..., 0]

    # Recovered: argmax(p * exp(gumbel)) == sample from p; mask the
    # draft token so the recovered token always differs from it.
    col = jax.lax.broadcasted_iota(jnp.int32, (R, K1, V), 2)
    masked = jnp.where(col == safe_targets[..., None], 0.0, probs)

    def row_noise(seed, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        key = jax.random.fold_in(key, 7919)
        return jax.random.gumbel(key, (K1, V), jnp.float32)

    noise = jax.vmap(row_noise)(meta.seeds, meta.steps)  # [R, K1, V]
    recovered = jnp.argmax(jnp.log(jnp.maximum(masked, 1e-30)) + noise,
                           axis=-1).astype(jnp.int32)
    return tgt_prob, recovered


def compute_token_logprobs(logits: jax.Array,
                           token_ids: jax.Array) -> jax.Array:
    """Logprob of each chosen token; logits [R, V], token_ids [R]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, token_ids[:, None], axis=-1)[:, 0]


def compute_topk_logprobs(
    logits: jax.Array,  # [R, V]
    sampled: jax.Array,  # [R]
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(sampled_logprob [R], topk_ids [R, k], topk_logprobs [R, k]).
    Ref analog: vllm/v1/engine/logprobs.py gather."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    sampled_lp = jnp.take_along_axis(logp, sampled[:, None],
                                     axis=-1)[:, 0]
    top_lp, top_ids = jax.lax.top_k(logp, k)
    return sampled_lp, top_ids.astype(jnp.int32), top_lp
