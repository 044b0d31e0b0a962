"""Mixtral-family decoder: Llama attention + MoE FFN.

Capability parity target: ref vllm/model_executor/models/mixtral.py
(MixtralForCausalLM; covers Mixtral-8x7B/8x22B configs). Reuses the
functional Llama attention path; the FFN is ops/moe.py fused_moe_apply
(exact grouped-GEMM MoE).

Param schema extends llama.py: each layer swaps gate_up_proj/down_proj
for
    router:    {"weight": [H, E]}
    w_gate_up: [E, H, 2*I_moe]
    w_down:    [E, I_moe, H]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import _attention, compute_logits  # noqa: F401
from vllm_tpu.ops.layers import rms_norm, rope_cos_sin
from vllm_tpu.ops.metadata import AttentionMetadata
from vllm_tpu.ops.moe import fused_moe_apply


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
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, kvc = _attention(cfg, layer, h, cos, sin, kv_caches[i],
                                   meta, q_blk)
        new_caches.append(kvc)
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + fused_moe_apply(h, layer["router"], layer["w_gate_up"],
                                layer["w_down"], cfg.num_experts_per_tok,
                                eplb=layer.get("eplb"))
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    H, KH, D, E = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, \
        cfg.hidden_size
    NE = cfg.num_experts
    I = cfg.moe_intermediate_size or cfg.intermediate_size

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
            "qkv_proj": {"weight": w((E, (H + 2 * KH) * D))},
            "o_proj": {"weight": w((H * D, E))},
            "post_attention_layernorm": jnp.ones((E, ), dtype),
            "router": {"weight": w((E, NE))},
            "w_gate_up": w((NE, E, 2 * I)),
            "w_down": w((NE, I, E)),
        })
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
