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


@functools.cache
def attention_backend() -> str:
    env = os.environ.get("VLLM_TPU_ATTN_BACKEND")
    if env in ("pallas", "xla"):
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
) -> jax.Array:
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
