"""Bamba-style hybrid decoder: interleaved Mamba2 + attention layers.

Capability parity target: ref vllm/model_executor/models/bamba.py
(BambaForCausalLM) — the hybrid-cache family (Jamba/Zamba/Granite-4
share this shape). Per-layer cache type mixes paged attention KV with
per-row SSM state (the runner's ``make_caches`` hook builds the list;
ref analog: KVCacheCoordinator hybrid groups,
vllm/v1/core/kv_cache_coordinator.py).

Block: input_layernorm -> (mamba | attention by cfg.layer_types) ->
residual -> pre_ff_layernorm -> MLP -> residual. Attention uses
partial rotary (cfg.partial_rotary_factor, handled inside apply_rope).

Layer schema: attention layers use llama leaves (qkv_proj/o_proj);
mamba layers use ops/mamba.py mixer leaves; both carry
gate_up_proj/down_proj ("feed_forward") and the two norms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import CacheConfig, ModelConfig
from vllm_tpu.models import llama
from vllm_tpu.models.llama import _mlp, compute_logits  # noqa: F401
from vllm_tpu.models.mamba2 import token_rows
from vllm_tpu.ops.kv_cache import make_kv_cache
from vllm_tpu.ops.layers import rms_norm, rope_cos_sin
from vllm_tpu.ops.mamba import make_mamba_state, mamba2_mixer
from vllm_tpu.ops.metadata import AttentionMetadata


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg: CacheConfig,
                kv_sharding=None) -> list:
    dtype = jnp.dtype(cfg.dtype)
    cache_dtype = cache_cfg.cache_dtype if cache_cfg else "auto"
    caches = []
    for lt in cfg.layer_types:
        if lt == "attention":
            caches.append(
                make_kv_cache(num_blocks, block_size, cfg.num_kv_heads,
                              cfg.head_dim, cache_dtype, cfg.dtype,
                              sharding=kv_sharding))
        else:
            caches.append(make_mamba_state(max_num_reqs, cfg, dtype))
    return caches


# Runner seg hint (static): see models/mamba2.py.
USES_SEG_HINT = True


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
        if cfg.layer_types[i] == "attention":
            out, cache = llama._attention(cfg, layer, h, cos, sin,
                                          kv_caches[i], meta, q_blk)
        else:
            out, cache = mamba2_mixer(cfg, layer, h, positions,
                                      kv_caches[i], row_of,
                                      decode_rows=(q_blk == 1),
                                      few_segments=seg_hint)
        new_caches.append(cache)
        x = x + out
        h = rms_norm(x, layer["pre_ff_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(layer, h)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    from vllm_tpu.models import mamba2 as _m2
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = cfg.hidden_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    I = cfg.intermediate_size
    mamba_layers = _m2.random_params(cfg, seed=seed + 1)["layers"]

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    layers = []
    for i, lt in enumerate(cfg.layer_types):
        layer = {
            "input_layernorm": jnp.ones((E, ), dtype),
            "pre_ff_layernorm": jnp.ones((E, ), dtype),
            "gate_up_proj": {"weight": w((E, 2 * I))},
            "down_proj": {"weight": w((I, E))},
        }
        if lt == "attention":
            layer["qkv_proj"] = {"weight": w((E, (H + 2 * KH) * D))}
            layer["o_proj"] = {"weight": w((H * D, E))}
        else:
            for k in ("in_proj", "conv_w", "conv_b", "A_log", "D",
                      "dt_bias", "mixer_norm", "out_proj"):
                layer[k] = mamba_layers[i][k]
        layers.append(layer)
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
