"""Ragged paged attention — unified prefill+decode over the paged KV
cache.

One op covers chunked prefill, decode, and spec-decode verification:
queries arrive as a flat ragged token stream (rows delimited by
``query_start_loc``), KV lives in the paged cache addressed by
``block_tables``. Same unification as the reference's triton unified
attention (ref: vllm/v1/attention/ops/triton_unified_attention.py) —
the scheduler never distinguishes phases, so neither does the kernel.

This module holds the XLA (pure jnp) implementation: runs on any
backend, serves as ground truth for the Pallas kernel
(:mod:`vllm_tpu.ops.pallas.ragged_attention`) and as the CPU path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vllm_tpu.ops.kv_cache import QuantKV, dequant_block_kv, split_kv


def token_row_ids(query_start_loc: jax.Array, num_tokens: int) -> jax.Array:
    """Map each flat token index to its request row.

    Row r owns tokens [qsl[r], qsl[r+1]). Padding tokens (>= qsl[-1])
    map to the last row; their output is never read.
    """
    t = jnp.arange(num_tokens, dtype=jnp.int32)
    return jnp.clip(
        jnp.searchsorted(query_start_loc, t, side="right").astype(jnp.int32)
        - 1, 0, query_start_loc.shape[0] - 2)


@partial(jax.jit, static_argnames=("sm_scale", "causal", "sliding_window",
                                   "logit_softcap", "chunk_stride",
                                   "return_lse"))
def ragged_paged_attention_xla(
    q: jax.Array,  # [T, H, D] (D true, unpadded)
    kv_cache: jax.Array,  # [num_blocks, 2*KH, block_size, Dp]
    block_tables: jax.Array,  # [R, max_blocks] int32
    query_start_loc: jax.Array,  # [R+1] int32 cumulative query lens
    seq_lens: jax.Array,  # [R] int32 total KV length per row
    *,
    sm_scale: float,
    causal: bool = True,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    chunk_stride: int = 1,
    chunk_offset: jax.Array | int = 0,
    return_lse: bool = False,
    sinks: jax.Array | None = None,  # [H] learned sink logits
) -> jax.Array:
    """Reference implementation. Materializes each row's full KV
    (gather over the block table) — memory-hungry but simple; the
    Pallas kernel streams blocks instead.

    ``chunk_stride``/``chunk_offset`` support context parallelism (ref
    analog: the DCP interleaved KV layout, cp_kv_cache_interleave_size
    + ops/dcp_alltoall.py): block-table slot i holds the KV of global
    token chunk ``i * chunk_stride + chunk_offset``, so key positions
    are strided. With ``return_lse`` the per-(token, head) log-sum-exp
    rides along for merge_attn_states."""
    T, H, D = q.shape
    R, max_blocks = block_tables.shape
    if isinstance(kv_cache, QuantKV):
        # Per-token-head dequant (ref analog: _cast_kv_tile INT8/FP8
        # modes, triton_unified_attention.py:38).
        kv_cache = dequant_block_kv(kv_cache)
    _, kh2, block_size, _ = kv_cache.shape
    KH = kh2 // 2
    G = H // KH  # query heads per KV head
    max_kv = max_blocks * block_size

    k_cache, v_cache = split_kv(kv_cache)  # [B, KH, bs, Dp]
    # Quantized caches (fp8) dequantize on gather — flush-to-zero, the
    # same decode the Pallas kernels use (fp8.py e4m3ftz_to_f32).
    ftz = kv_cache.dtype == jnp.float8_e4m3fn
    k_cache = k_cache[..., :D].astype(q.dtype)
    v_cache = v_cache[..., :D].astype(q.dtype)
    if ftz:
        k_cache = jnp.where(jnp.abs(k_cache) < 0.015625, 0.0, k_cache)
        v_cache = jnp.where(jnp.abs(v_cache) < 0.015625, 0.0, v_cache)
    # Per-row gathered KV: [R, max_kv, KH, D].
    k = k_cache[block_tables].transpose(0, 1, 3, 2, 4).reshape(
        R, max_kv, KH, D)
    v = v_cache[block_tables].transpose(0, 1, 3, 2, 4).reshape(
        R, max_kv, KH, D)

    rows = token_row_ids(query_start_loc, T)  # [T]
    q_lens = query_start_loc[1:] - query_start_loc[:-1]  # [R]
    # Absolute position of each query token in its sequence.
    local = jnp.arange(T, dtype=jnp.int32) - query_start_loc[rows]
    q_pos = seq_lens[rows] - q_lens[rows] + local  # [T]

    k_t = k[rows]  # [T, max_kv, KH, D]
    v_t = v[rows]
    # GQA without materializing repeated KV: fold query heads into
    # [KH, G] and contract per KV head.
    q4 = q.reshape(T, KH, G, D).astype(jnp.float32) * sm_scale
    scores = jnp.einsum("thgd,tshd->thgs", q4,
                        k_t.astype(jnp.float32))  # [T, KH, G, max_kv]
    if logit_softcap is not None:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)

    if chunk_stride == 1 and isinstance(chunk_offset, int) \
            and chunk_offset == 0:
        kv_pos = jnp.arange(max_kv, dtype=jnp.int32)  # [max_kv]
    else:
        chunk = (jnp.arange(max_blocks, dtype=jnp.int32) * chunk_stride +
                 chunk_offset)
        kv_pos = (chunk[:, None] * block_size + jnp.arange(
            block_size, dtype=jnp.int32)[None, :]).reshape(max_kv)
    mask = kv_pos[None, :] < seq_lens[rows][:, None]  # [T, max_kv]
    if causal:
        mask &= kv_pos[None, :] <= q_pos[:, None]
    if sliding_window is not None:
        mask &= kv_pos[None, :] > q_pos[:, None] - sliding_window
    mask4 = mask[:, None, None, :]
    scores = jnp.where(mask4, scores, -jnp.inf)

    # Rows that are fully masked (padding tokens, or — under context
    # parallelism — rows with no keys on this rank) produce zeros (and
    # lse = -inf, dropped by merge_attn_states).
    m = jnp.max(scores, axis=-1, keepdims=True)  # [T, KH, G, 1]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    if sinks is not None:
        # Attention sinks (gpt-oss): one extra per-head virtual column
        # whose probability mass is dropped from the numerator but
        # kept in the denominator (ref: modeling_gpt_oss
        # eager_attention_forward s_aux concat + drop).
        assert not return_lse, "sinks + LSE merge unsupported"
        sink4 = sinks.astype(jnp.float32).reshape(1, KH, G, 1)
        m_safe = jnp.maximum(m_safe, sink4)
    p = jnp.where(mask4, jnp.exp(scores - m_safe), 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        denom = denom + jnp.exp(sink4 - m_safe)
    out = jnp.einsum("thgs,tshd->thgd", p, v_t.astype(jnp.float32))
    out = out / jnp.where(denom > 0, denom, 1.0)
    out = out.reshape(T, H, D).astype(q.dtype)
    if not return_lse:
        return out
    d0 = denom[..., 0]
    lse = m_safe[..., 0] + jnp.log(jnp.where(d0 > 0, d0, 1.0))
    lse = jnp.where(d0 > 0, lse, -jnp.inf)
    return out, lse.reshape(T, H).astype(jnp.float32)


def merge_attn_states(
    outs: jax.Array,  # [C, T, H, D] partial attention outputs
    lses: jax.Array,  # [C, T, H] log-sum-exp of each partial's scores
) -> jax.Array:
    """Combine attention computed over disjoint KV chunks.

    The flash-attention merge identity (ref analog: csrc
    merge_attn_states + the cascade/DCP combine,
    vllm/v1/attention/ops/): with per-chunk softmax statistics
    ``lse_c = log sum_j exp(s_cj)``, the exact full-KV attention is

        out = sum_c softmax_weight_c * out_c,
        weight_c = exp(lse_c - lse_total),
        lse_total = log sum_c exp(lse_c)

    Chunks with no keys pass ``lse = -inf`` and drop out. This is the
    building block for cascade attention (shared-prefix split) and
    decode context parallelism (KV sharded over a mesh axis, merged
    with one small collective instead of gathering KV).
    """
    m = jnp.max(lses, axis=0, keepdims=True)  # [1, T, H]
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(lses - m)  # [C, T, H]
    total = jnp.sum(w, axis=0)  # [T, H]
    total = jnp.where(total > 0, total, 1.0)
    merged = jnp.einsum("cth,cthd->thd", w, outs.astype(jnp.float32))
    return (merged / total[..., None]).astype(outs.dtype)


@partial(jax.jit, static_argnames=("sm_scale", ))
def chunk_attention_with_lse(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,  # [T?, S, KH, D] per-row keys for this chunk
    v: jax.Array,
    valid: jax.Array,  # [T, S] bool key-validity mask
    *,
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Attention over one KV chunk returning (out [T, H, D],
    lse [T, H]) for merge_attn_states. Rows with zero valid keys
    return lse = -inf (dropped by the merge)."""
    T, H, D = q.shape
    KH = k.shape[2]
    G = H // KH
    qf = q.astype(jnp.float32) * sm_scale
    # group heads explicitly: [T, KH, G, D] x [T, S, KH, D]
    qg = qf.reshape(T, KH, G, D)
    scores = jnp.einsum("tkgd,tskd->tkgs", qg, k.astype(jnp.float32))
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(jnp.isfinite(scores), p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("tkgs,tskd->tkgd", p, v.astype(jnp.float32))
    out = out / jnp.where(denom > 0, denom, 1.0)
    lse = (m_safe[..., 0] + jnp.log(jnp.where(denom[..., 0] > 0,
                                              denom[..., 0], 1.0)))
    lse = jnp.where(denom[..., 0] > 0, lse, -jnp.inf)
    return (out.reshape(T, H, D).astype(q.dtype),
            lse.reshape(T, H).astype(jnp.float32))
