"""Cohere Command-R family (CohereForCausalLM, Cohere2ForCausalLM).

Capability parity target: ref vllm/model_executor/models/commandr.py.
Deltas vs llama (HF modeling_cohere / modeling_cohere2):

- PARALLEL residual block: one input LayerNorm feeds BOTH attention
  and MLP; x = x + attn(h) + mlp(h).
- bias-free mean-centered LayerNorm everywhere (not RMSNorm).
- full-dim INTERLEAVED rotary (pairs (2i, 2i+1)).
- optional per-head qk LayerNorm (use_qk_norm; weights [H, D]).
- tied embeddings + logit_scale on the LM head.
- Cohere2 (Command-R7B): interleaved sliding-window layers where ONLY
  sliding layers apply rope — full-attention layers are NoPE
  (modeling_cohere2 Cohere2Attention.forward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.layers import apply_rope_interleaved, rope_cos_sin
from vllm_tpu.ops.layers import silu_and_mul
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata


def _ln(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Cohere LayerNorm: mean-centered, weight-only, no bias."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu)**2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32)).astype(x.dtype)


def _layer_sliding(cfg: ModelConfig, i: int):
    if cfg.layer_types is not None:
        return (cfg.interleaved_sliding_window
                if cfg.layer_types[i] == "sliding_attention" else None)
    return cfg.sliding_window


def _attention(cfg, layer, x, cos, sin, kv_cache, meta, q_blk,
               sliding, use_rope):
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    qkv = linear(layer["qkv_proj"], x)
    q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
    q = q.reshape(T, H, D)
    k = k.reshape(T, KH, D)
    v = v.reshape(T, KH, D)
    if "q_norm" in layer:  # use_qk_norm: per-head LayerNorm [H, D]
        q = _ln(q, layer["q_norm"], eps)
        k = _ln(k, layer["k_norm"], eps)
    if use_rope:
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
    if q_blk == 1:
        out, kv_cache = fused_decode_attention(
            q, k, v, kv_cache, meta.block_tables, meta.seq_lens,
            sm_scale=float(D**-0.5), sliding_window=sliding,
            logit_softcap=None)
    else:
        kv_cache = write_kv(kv_cache, k, v, meta.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, meta.block_tables, meta.query_start_loc,
            meta.seq_lens, sm_scale=float(D**-0.5),
            sliding_window=sliding, q_blk=q_blk)
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
        h = _ln(x, layer["input_layernorm"], eps)
        sliding = _layer_sliding(cfg, i)
        # Cohere2: NoPE on full-attention layers.
        use_rope = (cfg.layer_types is None) or (sliding is not None)
        attn_out, kvc = _attention(cfg, layer, h, cos, sin,
                                   kv_caches[i], meta, q_blk, sliding,
                                   use_rope)
        new_caches.append(kvc)
        mlp_out = linear(
            layer["down_proj"],
            silu_and_mul(linear(layer["gate_up_proj"], h)))
        x = x + attn_out + mlp_out  # parallel block
    x = _ln(x, params["norm"], eps)
    return x, new_caches


def compute_logits(params: dict, cfg: ModelConfig,
                   hidden: jax.Array) -> jax.Array:
    scale = float((cfg.hf_config or {}).get("logit_scale", 1.0))
    return (hidden @ params["embed_tokens"]["weight"].T) * scale


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E, I = cfg.hidden_size, cfg.intermediate_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "input_layernorm": jnp.ones((E, ), dtype),
            "qkv_proj": {"weight": w((E, (H + 2 * KH) * D))},
            "o_proj": {"weight": w((H * D, E))},
            "gate_up_proj": {"weight": w((E, 2 * I))},
            "down_proj": {"weight": w((I, E))},
        }
        if (cfg.hf_config or {}).get("use_qk_norm"):
            layer["q_norm"] = jnp.ones((H, D), dtype)
            layer["k_norm"] = jnp.ones((KH, D), dtype)
        layers.append(layer)
    return {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
