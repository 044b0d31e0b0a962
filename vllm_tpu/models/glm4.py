"""GLM-4 family (Glm4ForCausalLM, GlmForCausalLM).

Capability parity target: ref vllm/model_executor/models/glm4.py /
glm.py. Llama-family decoder with three deltas (HF modeling_glm4):

- partial INTERLEAVED rotary: rotary_dim = head_dim *
  partial_rotary_factor (default 0.5), pairs (2i, 2i+1); the tail
  passes through unrotated.
- sandwich norms (Glm4 only): extra RMSNorms applied to the attention
  and MLP OUTPUTS before the residual add (post_self_attn_layernorm /
  post_mlp_layernorm); GlmForCausalLM (glm-edge) has no sandwich.
- fused gate_up chunked [gate, up] with SiLU (same as llama).

Param schema: llama.py's, plus per layer (Glm4):
    post_self_attn_layernorm [E], post_mlp_layernorm [E]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import _mlp, compute_logits  # noqa: F401
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.layers import (apply_rope_interleaved, rms_norm,
                                 rope_cos_sin)
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata


def _rope_partial_interleaved(x, cos, sin):
    rd = 2 * cos.shape[-1]
    if rd < x.shape[-1]:
        return jnp.concatenate(
            [apply_rope_interleaved(x[..., :rd], cos, sin), x[..., rd:]],
            axis=-1)
    return apply_rope_interleaved(x, cos, sin)


def _attention(cfg, layer, x, cos, sin, kv_cache, meta, q_blk):
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = linear(layer["qkv_proj"], x)
    q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
    q = _rope_partial_interleaved(q.reshape(T, H, D), cos, sin)
    k = _rope_partial_interleaved(k.reshape(T, KH, D), cos, sin)
    v = v.reshape(T, KH, D)
    if q_blk == 1:
        out, kv_cache = fused_decode_attention(
            q, k, v, kv_cache, meta.block_tables, meta.seq_lens,
            sm_scale=float(D**-0.5), sliding_window=cfg.sliding_window,
            logit_softcap=None)
    else:
        kv_cache = write_kv(kv_cache, k, v, meta.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, meta.block_tables, meta.query_start_loc,
            meta.seq_lens, sm_scale=float(D**-0.5),
            sliding_window=cfg.sliding_window, q_blk=q_blk)
    return linear(layer["o_proj"], out.reshape(T, H * D)), kv_cache


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list[jax.Array],
    meta: AttentionMetadata,
    q_blk: int = 128,
) -> tuple[jax.Array, list[jax.Array]]:
    x = params["embed_tokens"]["weight"][input_ids]
    cos, sin = rope_cos_sin(positions, cfg)
    eps = cfg.rms_norm_eps
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], eps)
        attn_out, kvc = _attention(cfg, layer, h, cos, sin,
                                   kv_caches[i], meta, q_blk)
        new_caches.append(kvc)
        if "post_self_attn_layernorm" in layer:  # Glm4 sandwich
            attn_out = rms_norm(attn_out,
                                layer["post_self_attn_layernorm"], eps)
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], eps)
        mlp_out = _mlp(layer, h)
        if "post_mlp_layernorm" in layer:
            mlp_out = rms_norm(mlp_out, layer["post_mlp_layernorm"],
                               eps)
        x = x + mlp_out
    x = rms_norm(x, params["norm"], eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    from vllm_tpu.models.llama import random_params as llama_params
    params = llama_params(cfg, seed)
    dtype = jnp.dtype(cfg.dtype)
    for layer in params["layers"]:
        layer["post_self_attn_layernorm"] = jnp.ones(
            (cfg.hidden_size, ), dtype)
        layer["post_mlp_layernorm"] = jnp.ones((cfg.hidden_size, ),
                                               dtype)
    return params
