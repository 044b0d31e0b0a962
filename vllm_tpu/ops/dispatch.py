"""Attention backend selection.

Ref analog: vllm/v1/attention/selector.py (``get_attn_backend():101``) —
platform + override env resolve the implementation. Here: Pallas kernel
on TPU, XLA reference elsewhere; ``VLLM_TPU_ATTN_BACKEND`` overrides
(values: ``pallas`` | ``xla``).
"""

from __future__ import annotations

import functools
import os

import jax


def _cp_size() -> int:
    from vllm_tpu.parallel.mesh import AXIS_CP, axis_size
    return axis_size(AXIS_CP)


def write_kv(kv_cache, k, v, slot_mapping):
    """Prefill write-through; under context parallelism each rank
    writes only its owned slots (parallel/context.py)."""
    from vllm_tpu.ops.kv_cache import write_kv_xla
    if _cp_size() > 1:
        from vllm_tpu.parallel.context import cp_write_kv
        return cp_write_kv(kv_cache, k, v, slot_mapping)
    return write_kv_xla(kv_cache, k, v, slot_mapping)


@functools.cache
def attention_backend() -> str:
    from vllm_tpu import envs
    env = envs.VLLM_TPU_ATTN_BACKEND
    if env is not None:
        return env
    # axon is the tunneled TPU platform in this environment.
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def ragged_paged_attention(
    q: jax.Array,  # [T_slack, H, D]
    kv_cache: jax.Array,  # [num_blocks, 2*KH, bs, Dp]
    block_tables: jax.Array,
    query_start_loc: jax.Array,
    seq_lens: jax.Array,
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    q_blk: int = 128,
    sinks: jax.Array | None = None,  # [H] learned sink logits
) -> jax.Array:
    if sinks is not None:
        # Attention sinks (gpt-oss): extra per-head softmax-denominator
        # term (ref: eager_attention_forward s_aux, modeling_gpt_oss).
        # XLA path only for now; a sink-aware Pallas epilogue is the
        # optimization path.
        assert _cp_size() == 1, "sinks unsupported under CP"
        from vllm_tpu.ops.attention import ragged_paged_attention_xla
        return ragged_paged_attention_xla(
            q, kv_cache, block_tables, query_start_loc, seq_lens,
            sm_scale=sm_scale, sliding_window=sliding_window,
            logit_softcap=logit_softcap, sinks=sinks)
    if _cp_size() > 1:
        # KV sharded over the cp mesh axis. Prefill-sized batches also
        # stripe the QUERY axis over cp and ring the stripes past the
        # shards (parallel/context.py) so prefill compute scales with
        # cp; tiny/ragged-unfriendly T falls back to replicated
        # queries + one-shot all-gather merge.
        cp = _cp_size()
        from vllm_tpu.parallel.context import (
            cp_prefill_attention_sharded_q, cp_ragged_attention)
        T = q.shape[0]
        if T % cp == 0 and T // cp >= 8:
            return cp_prefill_attention_sharded_q(
                q, kv_cache, block_tables, query_start_loc, seq_lens,
                sm_scale=sm_scale, sliding_window=sliding_window,
                logit_softcap=logit_softcap)
        return cp_ragged_attention(q, kv_cache, block_tables,
                                   query_start_loc, seq_lens,
                                   sm_scale=sm_scale,
                                   sliding_window=sliding_window,
                                   logit_softcap=logit_softcap)
    if attention_backend() == "pallas":
        from vllm_tpu.ops.pallas.ragged_attention import (
            ragged_paged_attention as pallas_attn)
        return pallas_attn(q, kv_cache, block_tables, query_start_loc,
                           seq_lens, sm_scale=sm_scale, q_blk=q_blk,
                           sliding_window=sliding_window,
                           logit_softcap=logit_softcap)
    from vllm_tpu.ops.attention import ragged_paged_attention_xla
    return ragged_paged_attention_xla(q, kv_cache, block_tables,
                                      query_start_loc, seq_lens,
                                      sm_scale=sm_scale,
                                      sliding_window=sliding_window,
                                      logit_softcap=logit_softcap)


def fused_decode_attention(
    q: jax.Array,  # [R, H, D] — row i IS request row i (1 token each)
    new_k: jax.Array,  # [R, KH, D]
    new_v: jax.Array,  # [R, KH, D]
    kv_cache: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,  # includes the new token
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    sinks: jax.Array | None = None,  # [H] learned sink logits
) -> tuple[jax.Array, jax.Array]:
    """Decode fast path: KV write fused into the attention kernel
    (in-place cache via input_output_aliases). XLA fallback: scatter
    write then gather attention. Returns (out, updated cache)."""
    if sinks is not None:
        assert _cp_size() == 1, "sinks unsupported under CP"
    if _cp_size() > 1:
        from vllm_tpu.parallel.context import cp_fused_decode_attention
        return cp_fused_decode_attention(q, new_k, new_v, kv_cache,
                                         block_tables, seq_lens,
                                         sm_scale=sm_scale,
                                         sliding_window=sliding_window,
                                         logit_softcap=logit_softcap)
    if attention_backend() == "pallas" and sinks is None:
        from vllm_tpu.ops.pallas.decode_attention import (
            decode_paged_attention, pallas_supports)
        if pallas_supports(kv_cache):
            return decode_paged_attention(q, new_k, new_v, kv_cache,
                                          block_tables, seq_lens,
                                          sm_scale=sm_scale,
                                          sliding_window=sliding_window,
                                          logit_softcap=logit_softcap)
    from vllm_tpu.ops.attention import ragged_paged_attention_xla
    from vllm_tpu.ops.kv_cache import QuantKV, write_kv_xla
    R = q.shape[0]
    import jax.numpy as jnp
    data = kv_cache.data if isinstance(kv_cache, QuantKV) else kv_cache
    block_size = data.shape[2]
    pos = jnp.maximum(seq_lens - 1, 0)
    slots = (jnp.take_along_axis(block_tables, (pos // block_size)[:, None],
                                 axis=1)[:, 0] * block_size +
             pos % block_size)
    kv_cache = write_kv_xla(kv_cache, new_k, new_v, slots)
    qsl = jnp.arange(R + 1, dtype=jnp.int32)
    out = ragged_paged_attention_xla(q, kv_cache, block_tables, qsl,
                                     seq_lens, sm_scale=sm_scale,
                                     sliding_window=sliding_window,
                                     logit_softcap=logit_softcap,
                                     sinks=sinks)
    return out, kv_cache
