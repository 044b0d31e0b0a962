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


def spec_processed_probs(
    logits: jax.Array,  # [R, K1, V] f32 (penalties/grammar applied)
    meta: SamplingMetadata,
) -> jax.Array:
    """Per-column target distribution with the row's sampling controls
    (temperature / top-k / top-p / min-p) applied — the `p` of the
    rejection identity."""
    R, K1, V = logits.shape
    temp = jnp.maximum(meta.temperature, 1e-6)[:, None, None]
    flat = (logits / temp).reshape(R * K1, V)
    flat = _apply_top_k_top_p(flat, jnp.repeat(meta.top_k, K1),
                              jnp.repeat(meta.top_p, K1))
    flat = _apply_min_p(flat, jnp.repeat(meta.min_p, K1))
    return jax.nn.softmax(flat, axis=-1).reshape(R, K1, V)


def spec_rejection_outputs(
    logits: jax.Array,  # [R, K1, V] f32 (penalties/grammar applied)
    draft_targets: jax.Array,  # [R, K1] i32 draft token per column (-1 pad)
    draft_probs,  # [R, K, V] draft distribution per slot j, or None
    bonus: jax.Array,  # [R] i32 column-K sample (emitted if all accept)
    meta: SamplingMetadata,
) -> tuple[jax.Array, jax.Array]:
    """Device-side stochastic rejection sampling (arXiv:2211.17192).

    Per row with d scheduled drafts (columns K-d..K-1 of
    ``draft_targets``; -1 elsewhere; column K is the bonus position):

    - draft slot j is accepted iff ``u_j * q_j(d_j) < p_j(d_j)`` where
      ``p`` is the processed target distribution and ``q`` the draft
      distribution (ref: vllm/v1/sample/rejection_sampler.py:38
      rejection_random_sample_kernel). ``draft_probs=None`` is the
      deterministic-proposal case (ngram/suffix/greedy device drafts):
      q is a point mass, the rule degrades to ``u_j < p_j(d_j)`` (the
      reference's NO_DRAFT_PROBS branch).
    - on the first rejection the row emits a sample from the residual
      ``normalize(max(p - q, 0))`` (ref: sample_recovered_tokens_kernel;
      point-mass q -> p with the draft token masked).
    - if every draft is accepted the row appends the bonus sample.

    Returns ``(tokens [R, K+1], n_new [R])``: the emitted tokens in
    order and how many are valid per row — the host slices, with NO
    host-side RNG (the uniforms and the recovery Gumbel noise come from
    the same counter-based per-row stream as the bonus sample, salted
    104729 / 7919 respectively, so a replayed step reproduces exactly).
    """
    R, K1, V = logits.shape
    K = K1 - 1
    probs = spec_processed_probs(logits, meta)

    d = jnp.sum((draft_targets[:, :K] >= 0).astype(jnp.int32), axis=1)
    j_idx = jnp.arange(K, dtype=jnp.int32)[None, :]  # [1, K]
    col = K - d[:, None] + j_idx  # [R, K] column of draft slot j
    valid = j_idx < d[:, None]
    col_safe = jnp.clip(col, 0, K - 1) if K else col
    # p restricted to the draft columns, slot-ordered. [R, K, V]
    p_slot = jnp.take_along_axis(probs, col_safe[:, :, None], axis=1)
    dtok = jnp.take_along_axis(draft_targets, col_safe, axis=1)  # [R, K]
    dtok_safe = jnp.clip(dtok, 0, V - 1)
    p_d = jnp.take_along_axis(p_slot, dtok_safe[..., None],
                              axis=2)[..., 0]  # [R, K]

    if draft_probs is None:
        q_d = jnp.ones_like(p_d)
        tok = jax.lax.broadcasted_iota(jnp.int32, (R, K, V), 2)
        residual = jnp.where(tok == dtok_safe[..., None], 0.0, p_slot)
    else:
        q = draft_probs.astype(jnp.float32)  # [R, K, V]
        q_d = jnp.take_along_axis(q, dtok_safe[..., None],
                                  axis=2)[..., 0]
        residual = jnp.maximum(p_slot - q, 0.0)

    def row_uniform(seed, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        key = jax.random.fold_in(key, 104729)
        return jax.random.uniform(key, (max(K, 1), ), jnp.float32)

    u = jax.vmap(row_uniform)(meta.seeds, meta.steps)[:, :K]
    accept = (u * jnp.maximum(q_d, 1e-30) < p_d) & valid
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1),
                    axis=1)  # [R] accepted prefix length

    def row_noise(seed, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        key = jax.random.fold_in(key, 7919)
        return jax.random.gumbel(key, (max(K, 1), V), jnp.float32)

    noise = jax.vmap(row_noise)(meta.seeds, meta.steps)[:, :K]
    recovered = jnp.argmax(
        jnp.log(jnp.maximum(residual, 1e-30)) + noise,
        axis=-1).astype(jnp.int32)  # [R, K]
    rec_at = jnp.take_along_axis(
        recovered, jnp.clip(n_acc, 0, max(K - 1, 0))[:, None],
        axis=1)[:, 0]  # [R] recovery sample at the first rejection

    t = jnp.arange(K1, dtype=jnp.int32)[None, :]  # emit position
    dtok_pad = jnp.pad(dtok, ((0, 0), (0, 1)))  # [R, K1]
    rejected = n_acc < d
    tokens = jnp.where(
        t < n_acc[:, None], dtok_pad,
        jnp.where(rejected[:, None], rec_at[:, None], bonus[:, None]))
    n_new = jnp.where(rejected, n_acc + 1, d + 1)
    return tokens, n_new.astype(jnp.int32)


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
