"""Mamba2 (pure SSM) causal LM.

Capability parity target: ref vllm/model_executor/models/mamba2.py
(Mamba2ForCausalLM) — decoder of gated SSD mixer blocks, no attention,
no paged KV: layer state is per-request-row (ops/mamba.py).

Param schema:
    embed_tokens {weight [V, E]}
    layers[i]: {"norm": [E], <mamba mixer leaves — see ops/mamba.py>}
    norm: [E]
    lm_head {weight}    (absent when tied)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import CacheConfig, ModelConfig
from vllm_tpu.models.llama import compute_logits  # noqa: F401
from vllm_tpu.ops.layers import rms_norm
from vllm_tpu.ops.mamba import MambaState, make_mamba_state, mamba2_mixer
from vllm_tpu.ops.metadata import AttentionMetadata


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg: CacheConfig,
                kv_sharding=None) -> list:
    """Per-layer state caches (runner hook replacing paged KV)."""
    dtype = jnp.dtype(cfg.dtype)
    return [
        make_mamba_state(max_num_reqs, cfg, dtype)
        for _ in range(cfg.num_layers)
    ]


def token_rows(meta: AttentionMetadata, T: int, R: int,
               q_blk: int) -> jax.Array:
    """Request row per token; R marks padding/inactive (drop)."""
    if q_blk == 1:  # decode loop: token t IS row t
        rows = jnp.arange(R, dtype=jnp.int32)
        return jnp.where(meta.seq_lens > 0, rows, R)
    qsl = meta.query_start_loc
    return (jnp.searchsorted(qsl, jnp.arange(T, dtype=qsl.dtype),
                             side="right") - 1).astype(jnp.int32)


# The runner passes seg_hint (static): True certifies the step's
# ragged stream has <= 8 segments, enabling the chunked SSD prefill
# (ops/mamba.py); decode-heavy mixed streams take the exact scan.
USES_SEG_HINT = True


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list[MambaState],
    meta: AttentionMetadata,
    q_blk: int = 128,
    seg_hint: bool = True,
) -> tuple[jax.Array, list[MambaState]]:
    x = params["embed_tokens"]["weight"][input_ids]
    T = x.shape[0]
    R = kv_caches[0].conv.shape[0]
    row_of = token_rows(meta, T, R, q_blk)
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["norm"], cfg.rms_norm_eps)
        out, st = mamba2_mixer(cfg, layer, h, positions, kv_caches[i],
                               row_of, decode_rows=(q_blk == 1),
                               few_segments=seg_hint)
        new_caches.append(st)
        x = x + out
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = cfg.hidden_size
    d_inner = cfg.mamba_d_inner
    G, N, nh, K = (cfg.mamba_n_groups, cfg.mamba_d_state,
                   cfg.mamba_num_heads, cfg.mamba_d_conv)
    conv_dim = d_inner + 2 * G * N

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
            "in_proj": {"weight": w((E, d_inner + conv_dim + nh))},
            "conv_w": w((K, conv_dim), scale=0.2),
            "conv_b": jnp.zeros((conv_dim, ), dtype),
            "A_log": jnp.zeros((nh, ), jnp.float32),
            "D": jnp.ones((nh, ), jnp.float32),
            "dt_bias": jnp.zeros((nh, ), jnp.float32),
            "mixer_norm": jnp.ones((d_inner, ), dtype),
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
