"""GPT-OSS (OpenAI open-weights MoE), TPU-first functional JAX.

Capability parity target: ref vllm/model_executor/models/gpt_oss.py —
as pure functions over a param pytree (conventions of models/llama.py).
Family quirks:

- Attention sinks: a learned per-head logit joins the softmax
  denominator (its probability mass is dropped from the numerator) —
  plumbed as ``sinks`` through ops/dispatch (XLA path; a sink-aware
  Pallas epilogue is the optimization follow-up).
- Alternating sliding-window layers (cfg.layer_types), biases on every
  attention projection.
- MoE with biased router (top-k then softmax over the top-k logits)
  and biased experts; clamped SwiGLU: glu = gate*sigmoid(1.702*gate)
  with gate clamped to [.., 7] and up to [-7, 7], out = (up+1)*glu.
  gate/up are INTERLEAVED in the checkpoint (gate_up[..., ::2] /
  [..., 1::2]); kept as stored — the model slices interleaved.
- RMSNorm scales in f32 before the cast (gemma-style placement, weight
  without the +1 offset).

Param pytree schema:

    embed_tokens: {"weight": [V, E]}
    layers[i]:
      input_layernorm / post_attention_layernorm: [E]
      qkv_proj: {"weight": [E, (H+2KH)*Dh], "bias": [(H+2KH)*Dh]}
      o_proj:   {"weight": [H*Dh, E], "bias": [E]}
      sinks:    [H]
      router:   {"weight": [E, NE], "bias": [NE]}
      experts:  {"gate_up": [NE, E, 2I], "gate_up_bias": [NE, 2I],
                 "down": [NE, I, E], "down_bias": [NE, E]}
    norm: [E]
    lm_head: {"weight": [E, V]}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.layers import apply_rope, rope_cos_sin
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata

ALPHA = 1.702  # fixed in the architecture (GptOssExperts)
LIMIT = 7.0


def _rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """GptOssRMSNorm: scale in f32, cast at the end."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * xf).astype(dtype)


def _layer_sliding(cfg: ModelConfig, i: int) -> int | None:
    if cfg.layer_types is None or cfg.interleaved_sliding_window is None:
        return None
    return (cfg.interleaved_sliding_window
            if cfg.layer_types[i] == "sliding_attention" else None)


def _attention(cfg, layer, x, cos, sin, kv_cache, meta, q_blk,
               sliding_window):
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = linear(layer["qkv_proj"], x)
    q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
    q = apply_rope(q.reshape(T, H, D), cos, sin)
    k = apply_rope(k.reshape(T, KH, D), cos, sin)
    v = v.reshape(T, KH, D)
    sinks = layer["sinks"]
    scale = float(D**-0.5)
    if q_blk == 1:
        out, kv_cache = fused_decode_attention(
            q, k, v, kv_cache, meta.block_tables, meta.seq_lens,
            sm_scale=scale, sliding_window=sliding_window, sinks=sinks)
    else:
        kv_cache = write_kv(kv_cache, k, v, meta.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, meta.block_tables, meta.query_start_loc,
            meta.seq_lens, sm_scale=scale,
            sliding_window=sliding_window, q_blk=q_blk, sinks=sinks)
    return linear(layer["o_proj"], out.reshape(T, H * D)), kv_cache


def _moe(cfg: ModelConfig, layer: dict, x: jax.Array) -> jax.Array:
    """Dense-dispatch MoE (every expert computes every token, weighted
    by the routing scores — zero for unrouted experts). MXU-friendly
    batched einsum; the grouped-GEMM/EP path (ops/moe.py) is the
    scale-out follow-up. Ref: GptOssTopKRouter + GptOssExperts."""
    T, E = x.shape
    ex = layer["experts"]
    logits = linear(layer["router"], x).astype(jnp.float32)  # [T, NE]
    topv, topi = jax.lax.top_k(logits, cfg.num_experts_per_tok)
    topv = jax.nn.softmax(topv, axis=-1)
    scores = jnp.zeros_like(logits).at[
        jnp.arange(T)[:, None], topi].set(topv)  # [T, NE]

    xf = x.astype(jnp.float32)
    gu = jnp.einsum("te,nei->nti", xf,
                    ex["gate_up"].astype(jnp.float32))
    gu = gu + ex["gate_up_bias"].astype(jnp.float32)[:, None, :]
    gate, up = gu[..., 0::2], gu[..., 1::2]  # HF interleaved layout
    gate = jnp.minimum(gate, LIMIT)
    up = jnp.clip(up, -LIMIT, LIMIT)
    glu = gate * jax.nn.sigmoid(gate * ALPHA)
    h = (up + 1.0) * glu  # [NE, T, I]
    out = jnp.einsum("nti,nie->nte", h,
                     ex["down"].astype(jnp.float32))
    out = out + ex["down_bias"].astype(jnp.float32)[:, None, :]
    out = jnp.einsum("nte,tn->te", out, scores)
    return out.astype(x.dtype)


def forward(params, cfg: ModelConfig, input_ids, positions, kv_caches,
            meta: AttentionMetadata, q_blk: int = 128, lora=None,
            lora_idx=None, input_embeds=None, cos_sin=None,
            aux_layers=None):
    x = (input_embeds if input_embeds is not None else
         params["embed_tokens"]["weight"][input_ids])
    cos, sin = (cos_sin if cos_sin is not None else
                rope_cos_sin(positions, cfg))
    new_caches = []
    aux = []
    for i, layer in enumerate(params["layers"]):
        if aux_layers is not None:
            aux.extend(x for j in aux_layers if j == i)
        h = _rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, kvc = _attention(cfg, layer, h, cos, sin,
                                   kv_caches[i], meta, q_blk,
                                   _layer_sliding(cfg, i))
        new_caches.append(kvc)
        x = x + attn_out
        h = _rms_norm(x, layer["post_attention_layernorm"],
                      cfg.rms_norm_eps)
        x = x + _moe(cfg, layer, h)
    x = _rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if aux_layers is not None:
        return x, new_caches, jnp.concatenate(aux, axis=-1)
    return x, new_caches


def compute_logits(params, cfg: ModelConfig, hidden) -> jax.Array:
    return jnp.dot(hidden, params["lm_head"]["weight"],
                   preferred_element_type=jnp.float32)


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    H, KH, D, E = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                   cfg.hidden_size)
    I = cfg.moe_intermediate_size or cfg.intermediate_size
    NE = cfg.num_experts

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_layernorm": jnp.ones((E, ), dtype),
            "qkv_proj": {"weight": w((E, (H + 2 * KH) * D)),
                         "bias": w(((H + 2 * KH) * D, ))},
            "o_proj": {"weight": w((H * D, E)), "bias": w((E, ))},
            "sinks": w((H, )),
            "post_attention_layernorm": jnp.ones((E, ), dtype),
            "router": {"weight": w((E, NE)), "bias": w((NE, ))},
            "experts": {
                "gate_up": w((NE, E, 2 * I)),
                "gate_up_bias": w((NE, 2 * I)),
                "down": w((NE, I, E)),
                "down_bias": w((NE, E)),
            },
        })
    return {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
        "lm_head": {"weight": w((E, cfg.vocab_size))},
    }
