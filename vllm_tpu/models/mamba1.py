"""Mamba (v1, selective scan) causal LM.

Capability parity target: ref vllm/model_executor/models/mamba.py
(MambaForCausalLM) + the v1 backend vllm/v1/attention/backends/
mamba1_attn.py — decoder of selective-scan mixer blocks, no attention.
Layer state is per-request-row (ops/mamba.py mamba1_mixer): decode is
a vectorized single-token update; prefill is a parallel
associative-scan over the linear recurrence (the TPU answer to the
reference's sequential CUDA selective_scan kernel).

Param schema:
    embed_tokens {weight [V, E]}
    layers[i]: {"norm": [E], <mamba1 mixer leaves — see ops/mamba.py>}
    norm: [E]
    lm_head {weight}    (absent when tied)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import CacheConfig, ModelConfig
from vllm_tpu.models.llama import compute_logits  # noqa: F401
from vllm_tpu.models.mamba2 import token_rows
from vllm_tpu.ops.layers import rms_norm
from vllm_tpu.ops.mamba import (MambaState, make_mamba1_state,
                                mamba1_mixer)
from vllm_tpu.ops.metadata import AttentionMetadata


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg: CacheConfig,
                kv_sharding=None) -> list:
    dtype = jnp.dtype(cfg.dtype)
    return [
        make_mamba1_state(max_num_reqs, cfg, dtype)
        for _ in range(cfg.num_layers)
    ]


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list[MambaState],
    meta: AttentionMetadata,
    q_blk: int = 128,
) -> tuple[jax.Array, list[MambaState]]:
    x = params["embed_tokens"]["weight"][input_ids]
    T = x.shape[0]
    R = kv_caches[0].conv.shape[0]
    row_of = token_rows(meta, T, R, q_blk)
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["norm"], cfg.rms_norm_eps)
        out, st = mamba1_mixer(cfg, layer, h, positions, kv_caches[i],
                               row_of, decode_rows=(q_blk == 1))
        new_caches.append(st)
        x = x + out
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = cfg.hidden_size
    d_inner = cfg.mamba_d_inner
    N, K, dtr = cfg.mamba_d_state, cfg.mamba_d_conv, cfg.mamba_dt_rank

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
            "norm": jnp.ones((E, ), dtype),
            "in_proj": {"weight": w((E, 2 * d_inner))},
            "conv_w": w((K, d_inner), scale=0.2),
            "conv_b": jnp.zeros((d_inner, ), dtype),
            "x_proj": {"weight": w((d_inner, dtr + 2 * N))},
            "dt_proj": {"weight": w((dtr, d_inner)),
                        "bias": jnp.zeros((d_inner, ), dtype)},
            "A_log": jnp.zeros((d_inner, N), jnp.float32),
            "D": jnp.ones((d_inner, ), jnp.float32),
            "out_proj": {"weight": w((d_inner, E))},
        })
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
