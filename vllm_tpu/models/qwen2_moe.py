"""Qwen2-MoE / Qwen3-MoE family: llama attention (qkv bias) + sparse
MoE with a sigmoid-gated shared expert.

Capability parity target: ref vllm/model_executor/models/qwen2_moe.py
(Qwen2MoeForCausalLM; qwen3_moe shares the shape minus the shared
expert). Routing: softmax over all experts, gather top-k, renormalize
iff norm_topk_prob. FFN output:

    y = moe(x) + sigmoid(x @ shared_gate) * shared_mlp(x)

Layer schema extends llama.py: MoE layers carry
    router {weight [H, E]}
    w_gate_up [E, H, 2*I_moe] / w_down          (stacked experts)
    gate_up_proj / down_proj                    (shared expert MLP)
    shared_gate {weight [H, 1]}
Dense layers (mlp_only_layers / decoder_sparse_step) carry plain
gate_up_proj/down_proj and no router.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import (_attention, _mlp,  # noqa: F401
                                   compute_logits)
from vllm_tpu.ops.layers import rms_norm, rope_cos_sin
from vllm_tpu.ops.metadata import AttentionMetadata
from vllm_tpu.ops.moe import fused_moe_apply


def _ffn(cfg: ModelConfig, layer: dict, x: jax.Array) -> jax.Array:
    if "router" not in layer:
        return _mlp(layer, x)
    out = fused_moe_apply(x, layer["router"], layer["w_gate_up"],
                          layer["w_down"], cfg.num_experts_per_tok,
                          renormalize=cfg.norm_topk_prob,
                          eplb=layer.get("eplb"))
    gate = jax.nn.sigmoid(
        jnp.dot(x.astype(jnp.float32),
                layer["shared_gate"]["weight"].astype(jnp.float32)))
    return out + gate.astype(x.dtype) * _mlp(layer, x)


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
        h = rms_norm(x, layer["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        x = x + _ffn(cfg, layer, h)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    H, KH, D, E = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                   cfg.hidden_size)
    NE = cfg.num_experts
    I_moe = cfg.moe_intermediate_size or cfg.intermediate_size
    I_sh = cfg.intermediate_size

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
            "o_proj": {"weight": w((H * D, E))},
            "post_attention_layernorm": jnp.ones((E, ), dtype),
            "router": {"weight": w((E, NE), scale=0.1)},
            "w_gate_up": w((NE, E, 2 * I_moe)),
            "w_down": w((NE, I_moe, E)),
            "gate_up_proj": {"weight": w((E, 2 * I_sh))},
            "down_proj": {"weight": w((I_sh, E))},
            "shared_gate": {"weight": w((E, 1))},
        })
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
