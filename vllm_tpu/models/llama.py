"""Llama-family decoder, TPU-first functional JAX.

Covers LlamaForCausalLM and config-compatible families (TinyLlama,
Llama-2/3, Qwen2 via attention_bias, Mistral via sliding_window).
Capability parity target: ref vllm/model_executor/models/llama.py
(LlamaForCausalLM:447 / LlamaModel:345 / LlamaAttention:123 /
LlamaMLP:80) — but written as pure functions over a param pytree:

- no nn.Module graph: ``forward(params, cfg, ...)`` is jit/pjit'd whole
- QKV and gate/up projections are pre-fused at load time (analog of
  MergedColumnParallelLinear / QKVParallelLinear, ref linear.py:661,
  1022) — one MXU matmul each
- KV write-through + ragged paged attention against the paged cache
- quantized layers swap their param leaf; the code path is identical
  (see ops/linear.py dispatch)

Param pytree schema (dense leaves; quantized leaves swap
weight -> qweight/scales[/qzeros]):

    embed_tokens: {"weight": [V, E]}
    layers[i]:
      input_layernorm:          [E]
      qkv_proj:  {"weight": [E, (H+2*KH)*Dh], "bias"?}
      o_proj:    {"weight": [H*Dh, E]}
      post_attention_layernorm: [E]
      gate_up_proj: {"weight": [E, 2*I]}
      down_proj:    {"weight": [I, E]}
    norm: [E]
    lm_head: {"weight": [E, V]}   (absent when tie_word_embeddings)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.layers import (apply_rope, rms_norm, rope_cos_sin,
                                 silu_and_mul)  # noqa: F401
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata


def _lora_linear(layer: dict, name: str, x: jax.Array,
                 lora: dict | None, lora_idx) -> jax.Array:
    """linear() + batched multi-LoRA delta when adapters target this
    leaf (ref analog: the LoRA layer wrappers, vllm lora/layers/)."""
    out = linear(layer[name], x)
    if lora is not None and name in lora:
        from vllm_tpu.ops.lora import lora_apply
        out = lora_apply(x, out, lora[name], lora_idx)
    return out


def _attention(
    cfg: ModelConfig,
    layer: dict,
    x: jax.Array,  # [T, E]
    cos: jax.Array,
    sin: jax.Array,
    kv_cache: jax.Array,
    meta: AttentionMetadata,
    q_blk: int,
    lora: dict | None = None,
    lora_idx=None,
) -> tuple[jax.Array, jax.Array]:
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    qkv = _lora_linear(layer, "qkv_proj", x, lora, lora_idx)
    q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
    q = q.reshape(T, H, D)
    k = k.reshape(T, KH, D)
    v = v.reshape(T, KH, D)

    # Qwen3-style per-head QK RMSNorm (presence-dispatched like quant
    # leaves; ref analog: qwen3.py q_norm/k_norm).
    if "q_norm" in layer:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if q_blk == 1:
        # Decode fast path (multi-step loop): row i == request row i;
        # KV write fused into the kernel, cache updated in place.
        out, kv_cache = fused_decode_attention(
            q, k, v, kv_cache, meta.block_tables, meta.seq_lens,
            sm_scale=float(D**-0.5), sliding_window=cfg.sliding_window,
            logit_softcap=None)
        return _lora_linear(layer, "o_proj", out.reshape(T, H * D),
                            lora, lora_idx), kv_cache

    # Write-through first, then attend over the whole [0, seq_len)
    # prefix from the cache — current tokens included (unified
    # prefill/decode contract, see ops/attention.py).
    kv_cache = write_kv(kv_cache, k, v, meta.slot_mapping)

    out = ragged_paged_attention(
        q,
        kv_cache,
        meta.block_tables,
        meta.query_start_loc,
        meta.seq_lens,
        sm_scale=float(D**-0.5),
        sliding_window=cfg.sliding_window,
        q_blk=q_blk,
    )
    return _lora_linear(layer, "o_proj", out.reshape(T, H * D), lora,
                        lora_idx), kv_cache


def _mlp(layer: dict, x: jax.Array, lora: dict | None = None,
         lora_idx=None) -> jax.Array:
    # Split gate_up / down launches: a fused MLP megakernel was built
    # and ablated in r3 (148 vs 135 us/layer at the 8B INT4 decode
    # shape — the split path's MSA-free 1MB-block streams win), so the
    # megakernel was removed rather than shipped default-off.
    h = silu_and_mul(_lora_linear(layer, "gate_up_proj", x, lora,
                                  lora_idx))
    return _lora_linear(layer, "down_proj", h, lora, lora_idx)


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [T]
    positions: jax.Array,  # [T]
    kv_caches: list[jax.Array],
    meta: AttentionMetadata,
    q_blk: int = 128,  # static: attention kernel query-window rows
    lora: dict | None = None,  # {leaf_name: stack} per layer list
    lora_idx=None,  # [T] adapter slot per token row
    input_embeds: jax.Array | None = None,  # VLM-merged embeddings
    cos_sin: tuple[jax.Array, jax.Array] | None = None,  # rope override
    aux_layers: tuple[int, ...] | None = None,  # EAGLE-3 aux taps
) -> tuple[jax.Array, list[jax.Array]]:
    """Returns (hidden_states [T, E], updated kv_caches).

    With ``aux_layers`` (static tuple of layer indices) also returns a
    third element: the residual stream captured at the *entry* of each
    listed layer, concatenated to [T, len(aux)*E] — the EAGLE-3 drafter
    input (ref analog: aux_hidden_state_layers capture in
    vllm/model_executor/models/llama.py + llama_eagle3.py).
    """
    x = (input_embeds if input_embeds is not None else
         params["embed_tokens"]["weight"][input_ids])
    # Under context parallelism shard the token axis so projections,
    # norms and MLP run on T/cp rows per rank, matching the
    # query-striped attention (parallel/context.py).
    from vllm_tpu.parallel.context import cp_shard_tokens
    x = cp_shard_tokens(x)
    cos, sin = (cos_sin if cos_sin is not None else
                rope_cos_sin(positions, cfg))
    new_caches = []
    aux = []
    for i, layer in enumerate(params["layers"]):
        if aux_layers is not None:
            # One tap per listed index (duplicates — tiny models —
            # capture the same stream twice); concat order follows the
            # sorted tuple, i.e. layer order.
            aux.extend(x for j in aux_layers if j == i)
        llora = lora[i] if lora is not None else None
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, kvc = _attention(cfg, layer, h, cos, sin, kv_caches[i],
                                   meta, q_blk, llora, lora_idx)
        new_caches.append(kvc)
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(layer, h, llora, lora_idx)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if aux_layers is not None:
        return x, new_caches, jnp.concatenate(aux, axis=-1)
    return x, new_caches


def _lm_head_matmul(hidden: jax.Array, w: jax.Array) -> jax.Array:
    """Dense LM head. Decode shapes stream the [E, V] weight through
    the Pallas matmul (XLA's dense dot reaches ~30% HBM BW at T<=64);
    prefill gathers only sampled rows first so T is small too, but
    large-T fallbacks stay on XLA."""
    from vllm_tpu.ops.dispatch import attention_backend
    T, K = hidden.shape
    if (attention_backend() == "pallas" and T <= 64 and K % 512 == 0
            and w.shape[1] % 128 == 0):
        from vllm_tpu.ops.pallas.matmul import decode_matmul
        return decode_matmul(hidden, w, out_dtype=jnp.float32)
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


def compute_logits(params: dict, cfg: ModelConfig,
                   hidden: jax.Array) -> jax.Array:
    """hidden [N, E] -> logits [N, V] (fp32, softcapped if configured).

    Ref analog: vllm LogitsProcessor:23 + ParallelLMHead:521.
    """
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"]["weight"].T
        logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    else:
        lm_head = params["lm_head"]
        if "qweight" in lm_head:
            # [..., :V]: prepare_weights pads vocab-width quantized
            # heads to a tile-friendly N (quant/kernels.py); the padded
            # columns decode to logit 0 and must not reach the sampler.
            logits = linear(lm_head,
                            hidden).astype(jnp.float32)[...,
                                                        :cfg.vocab_size]
        else:
            logits = _lm_head_matmul(hidden, lm_head["weight"])
    if cfg.logit_softcap is not None:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits


# -- initialization -----------------------------------------------------


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    """Random-weight pytree for tests/benchmarks (ref analog: the dummy
    model loader, vllm/model_executor/model_loader/dummy_loader.py)."""
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

    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "input_layernorm": jnp.ones((E, ), dtype),
            "qkv_proj": {"weight": w((E, (H + 2 * KH) * D))},
            "o_proj": {"weight": w((H * D, E))},
            "post_attention_layernorm": jnp.ones((E, ), dtype),
            "gate_up_proj": {"weight": w((E, 2 * I))},
            "down_proj": {"weight": w((I, E))},
        }
        if cfg.attention_bias:
            layer["qkv_proj"]["bias"] = w(((H + 2 * KH) * D, ))
        layers.append(layer)
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
