"""Qwen3-Next: hybrid Gated-DeltaNet + gated-attention MoE decoder.

Capability parity target: ref vllm/model_executor/models/qwen3_next.py
(Qwen3NextForCausalLM) + the GDN backend
(vllm/v1/attention/backends/gdn_attn.py). Per cfg.layer_types a layer
mixes either:

- "linear_attention": the Gated DeltaNet mixer (ops/gdn.py) with
  per-request-row (conv, S) state caches, or
- "full_attention": GQA with per-head output GATES (q_proj emits
  [q | gate] per head, attn_out * sigmoid(gate)), qk-norm and partial
  rotary, over the standard paged KV path;

followed by the Qwen-MoE FFN (router + stacked experts +
sigmoid-gated shared expert — reused from models/qwen2_moe._ffn).

Layer schema: attention layers {q_proj (2x width), k_proj, v_proj,
o_proj, q_norm, k_norm}; linear layers the ops/gdn.py leaves; both
carry the qwen2_moe MoE leaves + the two norms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import CacheConfig, ModelConfig
from vllm_tpu.models.llama import compute_logits  # noqa: F401
from vllm_tpu.models.mamba2 import token_rows
from vllm_tpu.models.qwen2_moe import _ffn
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.gdn import GDNState, gdn_mixer, make_gdn_state
from vllm_tpu.ops.kv_cache import make_kv_cache
from vllm_tpu.ops.layers import apply_rope, rms_norm, rope_cos_sin
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata

# Runner seg hint (static): certifies <= 8 stream segments, enabling
# the chunked WY-form GDN prefill (ops/gdn.py _chunked_delta).
USES_SEG_HINT = True


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg: CacheConfig,
                kv_sharding=None) -> list:
    dtype = jnp.dtype(cfg.dtype)
    cache_dtype = cache_cfg.cache_dtype if cache_cfg else "auto"
    caches = []
    for lt in cfg.layer_types:
        if lt == "full_attention":
            caches.append(
                make_kv_cache(num_blocks, block_size, cfg.num_kv_heads,
                              cfg.head_dim, cache_dtype, cfg.dtype,
                              sharding=kv_sharding))
        else:
            caches.append(make_gdn_state(max_num_reqs, cfg, dtype))
    return caches


def _gated_attention(cfg, layer, x, cos, sin, kv_cache, meta, q_blk):
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qg = linear(layer["q_proj"], x).reshape(T, H, 2 * D)
    q = qg[..., :D]
    gate = qg[..., D:].reshape(T, H * D)
    k = linear(layer["k_proj"], x).reshape(T, KH, D)
    v = linear(layer["v_proj"], x).reshape(T, KH, D)
    q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if q_blk == 1:
        out, kv_cache = fused_decode_attention(
            q, k, v, kv_cache, meta.block_tables, meta.seq_lens,
            sm_scale=float(D**-0.5), sliding_window=None,
            logit_softcap=None)
    else:
        kv_cache = write_kv(kv_cache, k, v, meta.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, meta.block_tables, meta.query_start_loc,
            meta.seq_lens, sm_scale=float(D**-0.5), sliding_window=None,
            q_blk=q_blk)
    out = out.reshape(T, H * D)
    out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
        out.dtype)
    return linear(layer["o_proj"], out), kv_cache


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list,
    meta: AttentionMetadata,
    q_blk: int = 128,
    seg_hint: bool = True,
) -> tuple[jax.Array, list]:
    x = params["embed_tokens"]["weight"][input_ids]
    T = x.shape[0]
    cos, sin = rope_cos_sin(positions, cfg)
    R = meta.block_tables.shape[0]
    row_of = token_rows(meta, T, R, q_blk)
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        if "in_proj_qkvz" in layer:
            out, cache = gdn_mixer(cfg, layer, h, positions,
                                   kv_caches[i], row_of,
                                   decode_rows=(q_blk == 1),
                                   few_segments=seg_hint)
        else:
            out, cache = _gated_attention(cfg, layer, h, cos, sin,
                                          kv_caches[i], meta, q_blk)
        new_caches.append(cache)
        x = x + out
        h = rms_norm(x, layer["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        x = x + _ffn(cfg, layer, h)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = cfg.hidden_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = cfg.gdn
    NE, I_moe = cfg.num_experts, cfg.moe_intermediate_size
    I_sh = cfg.intermediate_size
    key_dim = g["num_k_heads"] * g["head_k_dim"]
    val_dim = g["num_v_heads"] * g["head_v_dim"]
    conv_dim = 2 * key_dim + val_dim

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    layers = []
    for lt in cfg.layer_types:
        layer = {
            "input_layernorm": jnp.ones((E, ), dtype),
            "post_attention_layernorm": jnp.ones((E, ), dtype),
            "router": {"weight": w((E, NE), scale=0.1)},
            "w_gate_up": w((NE, E, 2 * I_moe)),
            "w_down": w((NE, I_moe, E)),
            "gate_up_proj": {"weight": w((E, 2 * I_sh))},
            "down_proj": {"weight": w((I_sh, E))},
            "shared_gate": {"weight": w((E, 1))},
        }
        if lt == "full_attention":
            layer.update({
                "q_proj": {"weight": w((E, 2 * H * D))},
                "k_proj": {"weight": w((E, KH * D))},
                "v_proj": {"weight": w((E, KH * D))},
                "o_proj": {"weight": w((H * D, E))},
                "q_norm": jnp.ones((D, ), dtype),
                "k_norm": jnp.ones((D, ), dtype),
            })
        else:
            layer.update({
                "in_proj_qkvz": {"weight": w((E, 2 * key_dim +
                                              2 * val_dim))},
                "in_proj_ba": {"weight": w((E, 2 * g["num_v_heads"]))},
                "conv_w": w((g["conv_kernel"], conv_dim), scale=0.2),
                "A_log": jnp.zeros((g["num_v_heads"], ), jnp.float32),
                "dt_bias": jnp.zeros((g["num_v_heads"], ), jnp.float32),
                "gdn_norm": jnp.ones((g["head_v_dim"], ), dtype),
                "out_proj": {"weight": w((val_dim, E))},
            })
        layers.append(layer)
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
