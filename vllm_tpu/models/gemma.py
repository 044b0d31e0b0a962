"""Gemma family (Gemma-1/2/3-text), TPU-first functional JAX.

Capability parity target: ref vllm/model_executor/models/gemma.py,
gemma2.py, gemma3.py — as pure functions over a param pytree (same
conventions as models/llama.py). Family quirks handled here:

- RMSNorm scales by (1 + weight) with f32 internals (HF GemmaRMSNorm).
- Embeddings scaled by sqrt(hidden_size), computed in the model dtype
  (HF casts the normalizer to dtype — bf16 rounds it).
- GeGLU MLP: gelu_tanh(gate) * up.
- Tied embeddings always; final logit softcap (Gemma-2).
- Gemma-2: sandwich norms (post_attention norm applies to the
  attention *output*; pre/post_feedforward norms around the MLP),
  attention-score softcap, query_pre_attn_scalar attention scale,
  interleaved sliding-window layers (cfg.layer_types).
- Gemma-3: per-head QK-norm (over head_dim), dual rope (sliding
  layers use rope_local_base_freq, global layers rope_theta +
  optional linear scaling).

Param pytree schema = llama's, plus optional per-layer
pre_feedforward_layernorm / post_feedforward_layernorm / q_norm /
k_norm (presence-dispatched, like quant leaves).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.layers import apply_rope
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata


def gemma_rms_norm(x: jax.Array, weight: jax.Array,
                   eps: float) -> jax.Array:
    """HF GemmaRMSNorm: normalize AND scale by (1 + w) in f32, cast
    back at the end (llama casts back before scaling)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    out = xf * (1.0 + weight.astype(jnp.float32))
    return out.astype(dtype)


def _gelu_tanh(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    inner = math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)
    return (0.5 * xf * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def _geglu(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return _gelu_tanh(gate) * up


def _layer_sliding(cfg: ModelConfig, i: int) -> int | None:
    if cfg.layer_types is None or cfg.interleaved_sliding_window is None:
        return None
    return (cfg.interleaved_sliding_window
            if cfg.layer_types[i] == "sliding_attention" else None)


def _rope_cos_sin(positions: jax.Array, cfg: ModelConfig,
                  base: float) -> tuple[jax.Array, jax.Array]:
    """Plain / linear-scaled rope at an explicit base (gemma3's dual
    rope: local layers use rope_local_base_freq)."""
    D = cfg.head_dim
    inv = 1.0 / (base**(jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    pos = positions.astype(jnp.float32)
    rs = cfg.rope_scaling or {}
    if rs.get("rope_type", rs.get("type")) == "linear":
        pos = pos / float(rs.get("factor", 1.0))
    freqs = pos[:, None] * inv[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def _attention(cfg, layer, x, cos, sin, kv_cache, meta, q_blk,
               sliding_window, lora=None, lora_idx=None):
    from vllm_tpu.models.llama import _lora_linear
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = _lora_linear(layer, "qkv_proj", x, lora, lora_idx)
    q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
    q = q.reshape(T, H, D)
    k = k.reshape(T, KH, D)
    v = v.reshape(T, KH, D)
    if "q_norm" in layer:  # Gemma-3 per-head QK norm
        q = gemma_rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = gemma_rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    scale = ((cfg.query_pre_attn_scalar or D)**-0.5)
    if q_blk == 1:
        out, kv_cache = fused_decode_attention(
            q, k, v, kv_cache, meta.block_tables, meta.seq_lens,
            sm_scale=scale, sliding_window=sliding_window,
            logit_softcap=cfg.attn_logit_softcap)
        return _lora_linear(layer, "o_proj", out.reshape(T, H * D),
                            lora, lora_idx), kv_cache
    kv_cache = write_kv(kv_cache, k, v, meta.slot_mapping)
    out = ragged_paged_attention(
        q, kv_cache, meta.block_tables, meta.query_start_loc,
        meta.seq_lens, sm_scale=scale, sliding_window=sliding_window,
        logit_softcap=cfg.attn_logit_softcap, q_blk=q_blk)
    return _lora_linear(layer, "o_proj", out.reshape(T, H * D), lora,
                        lora_idx), kv_cache


def forward(params, cfg: ModelConfig, input_ids, positions, kv_caches,
            meta: AttentionMetadata, q_blk: int = 128, lora=None,
            lora_idx=None, input_embeds=None, cos_sin=None,
            aux_layers=None):
    """Returns (hidden_states [T, E], updated kv_caches)."""
    x = (input_embeds if input_embeds is not None else
         params["embed_tokens"]["weight"][input_ids])
    # HF: normalizer = tensor(E**0.5, dtype) — cast BEFORE multiply.
    normalizer = jnp.asarray(cfg.hidden_size**0.5, x.dtype)
    x = x * normalizer
    cos_g, sin_g = _rope_cos_sin(positions, cfg, cfg.rope_theta)
    if cfg.rope_local_base_freq is not None:
        cos_l, sin_l = _rope_cos_sin(positions, cfg,
                                     cfg.rope_local_base_freq)
    new_caches = []
    aux = []
    for i, layer in enumerate(params["layers"]):
        if aux_layers is not None:
            aux.extend(x for j in aux_layers if j == i)
        llora = lora[i] if lora is not None else None
        sliding = _layer_sliding(cfg, i)
        if cfg.rope_local_base_freq is not None and sliding is not None:
            cos, sin = cos_l, sin_l
        else:
            cos, sin = cos_g, sin_g
        h = gemma_rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, kvc = _attention(cfg, layer, h, cos, sin,
                                   kv_caches[i], meta, q_blk, sliding,
                                   llora, lora_idx)
        new_caches.append(kvc)
        sandwich = "pre_feedforward_layernorm" in layer
        if sandwich:  # Gemma-2/3: norm the attention output
            attn_out = gemma_rms_norm(attn_out,
                                      layer["post_attention_layernorm"],
                                      cfg.rms_norm_eps)
        x = x + attn_out
        if sandwich:
            h = gemma_rms_norm(x, layer["pre_feedforward_layernorm"],
                               cfg.rms_norm_eps)
            mlp_out = _mlp(layer, h, llora, lora_idx)
            mlp_out = gemma_rms_norm(
                mlp_out, layer["post_feedforward_layernorm"],
                cfg.rms_norm_eps)
        else:  # Gemma-1: llama placement
            h = gemma_rms_norm(x, layer["post_attention_layernorm"],
                               cfg.rms_norm_eps)
            mlp_out = _mlp(layer, h, llora, lora_idx)
        x = x + mlp_out
    x = gemma_rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if aux_layers is not None:
        return x, new_caches, jnp.concatenate(aux, axis=-1)
    return x, new_caches


def _mlp(layer, x, lora=None, lora_idx=None):
    from vllm_tpu.models.llama import _lora_linear
    gate_up = _lora_linear(layer, "gate_up_proj", x, lora, lora_idx)
    return _lora_linear(layer, "down_proj", _geglu(gate_up), lora,
                        lora_idx)


def compute_logits(params, cfg: ModelConfig, hidden) -> jax.Array:
    w = params["embed_tokens"]["weight"].T  # tied
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    if cfg.logit_softcap is not None:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    H, KH, D, E, I = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                      cfg.hidden_size, cfg.intermediate_size)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    sandwich = cfg.query_pre_attn_scalar is not None
    qk_norm = cfg.rope_local_base_freq is not None
    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "input_layernorm": jnp.zeros((E, ), dtype),
            "qkv_proj": {"weight": w((E, (H + 2 * KH) * D))},
            "o_proj": {"weight": w((H * D, E))},
            "post_attention_layernorm": jnp.zeros((E, ), dtype),
            "gate_up_proj": {"weight": w((E, 2 * I))},
            "down_proj": {"weight": w((I, E))},
        }
        if sandwich:
            layer["pre_feedforward_layernorm"] = jnp.zeros((E, ), dtype)
            layer["post_feedforward_layernorm"] = jnp.zeros((E, ), dtype)
        if qk_norm:
            layer["q_norm"] = jnp.zeros((D, ), dtype)
            layer["k_norm"] = jnp.zeros((D, ), dtype)
        layers.append(layer)
    return {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.zeros((E, ), dtype),
    }
