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
                                   "logit_softcap"))
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
) -> jax.Array:
    """Reference implementation. Materializes each row's full KV
    (gather over the block table) — memory-hungry but simple; the
    Pallas kernel streams blocks instead."""
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
    # Quantized caches (fp8) dequantize on gather.
    k_cache = k_cache[..., :D].astype(q.dtype)
    v_cache = v_cache[..., :D].astype(q.dtype)
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

    kv_pos = jnp.arange(max_kv, dtype=jnp.int32)  # [max_kv]
    mask = kv_pos[None, :] < seq_lens[rows][:, None]  # [T, max_kv]
    if causal:
        mask &= kv_pos[None, :] <= q_pos[:, None]
    if sliding_window is not None:
        mask &= kv_pos[None, :] > q_pos[:, None] - sliding_window
    mask4 = mask[:, None, None, :]
    scores = jnp.where(mask4, scores, -jnp.inf)

    # Rows that are fully masked (padding tokens) produce zeros.
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(mask4, probs, 0.0)
    out = jnp.einsum("thgs,tshd->thgd", probs, v_t.astype(jnp.float32))
    return out.reshape(T, H, D).astype(q.dtype)
