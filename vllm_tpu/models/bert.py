"""BERT-class encoder-only embedding model.

Capability parity target: ref vllm/model_executor/models/bert.py
(BertEmbeddingModel / BertModel) — the encoder-only family backing
/v1/embeddings with sentence-transformers-style checkpoints. The
engine's pooling machinery (runner pooling accumulators, PoolingParams
mean/cls/last) is model-agnostic; this module supplies the encoder
forward.

TPU-native formulation: no KV cache, no decode — an embedding request
is a single prefill. Attention is BIDIRECTIONAL within each request;
the ragged multi-request stream is handled with a dense segment mask
(token i attends to token j iff same request), so several requests
batch into one MXU-dense step. Chunked prefill is incompatible with
bidirectionality, so the engine must schedule whole prompts
(REQUIRES_FULL_PREFILL; asserted at engine init).

Param schema:
    embed_tokens {weight [V, E]}
    pos_embed    [P, E]           (learned absolute positions)
    tt_embed     [TT, E]          (token-type 0 is used)
    embed_ln     {weight, bias}
    layers[i]:
      qkv_proj {weight [E, 3E], bias}
      o_proj   {weight [E, E], bias}
      attn_ln  {weight, bias}          (post-LN)
      up_proj  {weight [E, I], bias}   (GELU)
      down_proj{weight [I, E], bias}
      out_ln   {weight, bias}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.metadata import AttentionMetadata

# Engine contract: schedule whole prompts (no chunked prefill) — the
# encoder attends bidirectionally over the full sequence.
REQUIRES_FULL_PREFILL = True


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg, kv_sharding=None) -> list:
    """Encoder-only: no KV state. One tiny placeholder per layer keeps
    the runner's donated-cache plumbing uniform."""
    return [jnp.zeros((1, ), jnp.float32) for _ in range(cfg.num_layers)]


def _layer_norm(x: jax.Array, ln: dict, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * ln["weight"].astype(jnp.float32) +
            ln["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(leaf: dict, x: jax.Array) -> jax.Array:
    return x @ leaf["weight"] + leaf["bias"]


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list,
    meta: AttentionMetadata,
    q_blk: int = 128,
) -> tuple[jax.Array, list]:
    T = input_ids.shape[0]
    H = cfg.num_heads
    D = cfg.head_dim
    eps = cfg.rms_norm_eps  # layer_norm_eps rides the same field

    # Roberta-class checkpoints offset learned positions by
    # pad_token_id + 1 (HF create_position_ids_from_input_ids);
    # plain BERT starts at 0.
    off = 0
    if cfg.architecture in ("RobertaModel", "XLMRobertaModel",
                            "RobertaForSequenceClassification",
                            "XLMRobertaForSequenceClassification"):
        off = (cfg.hf_config or {}).get("pad_token_id", 1) + 1
    x = (params["embed_tokens"]["weight"][input_ids] +
         params["pos_embed"][positions + off] + params["tt_embed"][0])
    x = _layer_norm(x, params["embed_ln"], eps)

    # Same-request bidirectional mask from the ragged layout.
    qsl = meta.query_start_loc
    idx = jnp.arange(T, dtype=qsl.dtype)
    seg = jnp.searchsorted(qsl, idx, side="right") - 1
    # Padding tokens (beyond the real stream, idx >= qsl[-1]) would
    # otherwise fold into the last request's segment.
    valid = idx < qsl[-1]
    mask = ((seg[:, None] == seg[None, :]) & valid[:, None]
            & valid[None, :])
    scale = D**-0.5

    for layer in params["layers"]:
        qkv = _dense(layer["qkv_proj"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(T, H, D)
        k = k.reshape(T, H, D)
        v = v.reshape(T, H, D)
        scores = jnp.einsum("ihd,jhd->hij", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[None], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("hij,jhd->ihd", attn, v).reshape(T, H * D)
        x = _layer_norm(x + _dense(layer["o_proj"], o),
                        layer["attn_ln"], eps)
        h = jax.nn.gelu(_dense(layer["up_proj"], x).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = _layer_norm(x + _dense(layer["down_proj"], h),
                        layer["out_ln"], eps)
    return x, kv_caches


def compute_logits(params: dict, cfg: ModelConfig,
                   hidden: jax.Array) -> jax.Array:
    """Encoder-only model: no LM head. Zero logits keep the runner's
    fused forward+sample program uniform (pooling requests never emit
    tokens — they finish at prompt completion)."""
    return jnp.zeros((hidden.shape[0], cfg.vocab_size), hidden.dtype)


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E, I = cfg.hidden_size, cfg.intermediate_size

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    def ln():
        return {"weight": jnp.ones((E, ), dtype),
                "bias": jnp.zeros((E, ), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "qkv_proj": {"weight": w((E, 3 * E)),
                         "bias": jnp.zeros((3 * E, ), dtype)},
            "o_proj": {"weight": w((E, E)),
                       "bias": jnp.zeros((E, ), dtype)},
            "attn_ln": ln(),
            "up_proj": {"weight": w((E, I)),
                        "bias": jnp.zeros((I, ), dtype)},
            "down_proj": {"weight": w((I, E)),
                          "bias": jnp.zeros((E, ), dtype)},
            "out_ln": ln(),
        })
    return {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "pos_embed": w((cfg.max_model_len, E)),
        "tt_embed": w((2, E)),
        "embed_ln": ln(),
        "layers": layers,
    }
