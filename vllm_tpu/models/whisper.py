"""Whisper speech-to-text (encoder-decoder).

Capability parity target: ref vllm/model_executor/models/whisper.py
(WhisperForConditionalGeneration) + the OpenAI transcription endpoint
(vllm/entrypoints/openai/speech_to_text.py). Architecture: audio
log-mel -> conv frontend -> bidirectional encoder (run ONCE per
request, like a vision tower), then a causal decoder with per-layer
cross-attention to the encoder states.

TPU-native serving design: the reference runs the encoder inside the
forward and stores cross-attention KV in dedicated cache blocks
(EncoderDecoderModelRunner). Here the encoder + per-layer cross-KV
projection run once at request admission (runner._install_mm, the
audio analog of the vision-tower call) and the projected cross-KV is
scattered into per-request-ROW cache slabs — decode then needs zero
encoder work: self-attention rides the standard paged KV path and
cross-attention is one dense [R, F] MXU dot against the row's slab.
Whisper always pads audio to a fixed 30 s window, so F (encoder
frames) is static — no ragged encoder shapes ever reach jit.

Cache layout per decoder layer (make_caches):
    (paged_self_kv [std shape], cross_k [R, F, H, D], cross_v [R, F, H, D])

Param schema:
    audio_encoder:
      conv1 {weight [E, 80, 3], bias}   conv2 {weight [E, E, 3], bias}
      pos [F, E]   (stored sinusoidal table)
      layers[i]: {attn_ln {w,b}, qkv_proj {weight,bias}, o_proj {w,b},
                  fc1 {w,b}, fc2 {w,b}, final_ln {w,b}}
      ln {w,b}
    embed_tokens {weight [V, E]}      dec_pos [Tmax, E]
    layers[i]: {self_ln {w,b}, qkv_proj {w,b}, o_proj {w,b},
                cross_ln {w,b}, cross_q {w,b}, cross_k {weight},
                cross_v {w,b}, cross_o {w,b},
                fc_ln {w,b}, fc1 {w,b}, fc2 {w,b}}
    norm {weight, bias}               (lm head = tied embed_tokens)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import CacheConfig, ModelConfig
from vllm_tpu.models.mamba2 import token_rows
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.kv_cache import kv_cache_shape
from vllm_tpu.ops.metadata import AttentionMetadata

IS_ENCODER_DECODER = True
USES_SEG_HINT = True


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) *
            p["weight"].astype(jnp.float32) +
            p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(p, x):
    out = x @ p["weight"]
    return out + p["bias"] if "bias" in p else out


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg: CacheConfig,
                kv_sharding=None) -> list:
    dtype = jnp.dtype(cfg.dtype)
    F = cfg.audio["max_source_positions"]
    H, D = cfg.num_heads, cfg.head_dim
    shape = kv_cache_shape(num_blocks, block_size, cfg.num_kv_heads, D)
    return [
        (jnp.zeros(shape, dtype),
         jnp.zeros((max_num_reqs, F, H, D), dtype),
         jnp.zeros((max_num_reqs, F, H, D), dtype))
        for _ in range(cfg.num_layers)
    ]


# -- encoder (admission-time; not part of the serving step) -----------


def encode_audio(params: dict, cfg: ModelConfig,
                 mel: jax.Array) -> jax.Array:
    """Log-mel [80, 2F] -> encoder states [F, E] (bidirectional)."""
    enc = params["audio_encoder"]
    ac = cfg.audio
    x = mel.astype(jnp.float32)[None]  # [1, 80, T]
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["weight"].astype(jnp.float32), (1, ),
        [(1, 1)], dimension_numbers=("NCW", "OIW", "NCW"))
    x = jax.nn.gelu(x + enc["conv1"]["bias"][None, :, None], approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["weight"].astype(jnp.float32), (2, ),
        [(1, 1)], dimension_numbers=("NCW", "OIW", "NCW"))
    x = jax.nn.gelu(x + enc["conv2"]["bias"][None, :, None], approximate=False)
    x = x[0].T.astype(jnp.dtype(cfg.dtype))  # [F, E]
    x = x + enc["pos"][:x.shape[0]]
    F = x.shape[0]
    H = ac["encoder_attention_heads"]
    D = cfg.hidden_size // H
    scale = D**-0.5
    for layer in enc["layers"]:
        h = _ln(x, layer["attn_ln"])
        qkv = _dense(layer["qkv_proj"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(F, H, D)
        k = k.reshape(F, H, D)
        v = v.reshape(F, H, D)
        s = jnp.einsum("ihd,jhd->hij", q, k,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("hij,jhd->ihd", a, v).reshape(F, -1)
        x = x + _dense(layer["o_proj"], o)
        h = _ln(x, layer["final_ln"])
        h = jax.nn.gelu(_dense(layer["fc1"], h).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + _dense(layer["fc2"], h)
    return _ln(x, enc["ln"])


def encode_cross_kv(params: dict, cfg: ModelConfig, mel: jax.Array):
    """Encoder + per-decoder-layer cross-KV projection: the one-time
    per-request audio work (ref analog: the encoder forward + cross
    KV population in vllm whisper.py). Returns (k, v) [L, F, H, D]."""
    enc = encode_audio(params, cfg, mel)  # [F, E]
    H, D = cfg.num_heads, cfg.head_dim
    F = enc.shape[0]
    ks, vs = [], []
    for layer in params["layers"]:
        ks.append(_dense(layer["cross_k"], enc).reshape(F, H, D))
        vs.append(_dense(layer["cross_v"], enc).reshape(F, H, D))
    return jnp.stack(ks), jnp.stack(vs)


# -- decoder serving step --------------------------------------------


def _cross_attention(cfg, layer, x, row_of, cross_k, cross_v,
                     decode_rows: bool, few_segments: bool):
    """q [T, E] vs per-row encoder slabs [R, F, H, D]."""
    T = x.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    scale = D**-0.5
    q = _dense(layer["cross_q"], x).reshape(T, H, D) * scale
    R = cross_k.shape[0]
    if decode_rows:
        # token t IS row t: one batched dot, no gather.
        s = jnp.einsum("rhd,rfhd->rhf", q, cross_k,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("rhf,rfhd->rhd", a, cross_v)
    elif few_segments:
        # Ragged prefill, <= 8 segments (runner seg hint): compute
        # against each segment's slab densely, select per token.
        S = 8
        idx = jnp.arange(T, dtype=jnp.int32)
        prev = jnp.concatenate([jnp.full((1, ), -1, row_of.dtype),
                                row_of[:-1]])
        is_start = (idx == 0) | (row_of != prev)
        seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        sl = jnp.clip(seg_id, 0, S - 1)
        oh = sl[:, None] == jnp.arange(S)  # [T, S]
        first = jnp.min(jnp.where(oh, idx[:, None], T - 1), axis=0)
        seg_row = jnp.minimum(row_of[first], R - 1)  # [S]
        Ks = cross_k[seg_row]  # [S, F, H, D]
        Vs = cross_v[seg_row]
        s = jnp.einsum("thd,sfhd->tshf", q, Ks,
                       preferred_element_type=jnp.float32)
        s = jnp.take_along_axis(s, sl[:, None, None, None], axis=1)[:, 0]
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o_all = jnp.einsum("thf,sfhd->tshd", a, Vs)
        o = jnp.take_along_axis(o_all, sl[:, None, None, None],
                                axis=1)[:, 0]
    else:
        # Fallback (decode-heavy mixed streams): per-token gather.
        Kt = cross_k[jnp.minimum(row_of, R - 1)]  # [T, F, H, D]
        Vt = cross_v[jnp.minimum(row_of, R - 1)]
        s = jnp.einsum("thd,tfhd->thf", q, Kt,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("thf,tfhd->thd", a, Vt)
    return _dense(layer["cross_o"], o.reshape(T, H * D))


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
    T = input_ids.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = (params["embed_tokens"]["weight"][input_ids] +
         params["dec_pos"][positions])
    R = kv_caches[0][1].shape[0]
    row_of = token_rows(meta, T, R, q_blk)
    decode = q_blk == 1
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        paged, cross_k, cross_v = kv_caches[i]
        # Self-attention over the paged cache (standard decoder path).
        h = _ln(x, layer["self_ln"])
        qkv = _dense(layer["qkv_proj"], h)
        q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
        q = q.reshape(T, H, D)
        k = k.reshape(T, KH, D)
        v = v.reshape(T, KH, D)
        if decode:
            o, paged = fused_decode_attention(
                q, k, v, paged, meta.block_tables, meta.seq_lens,
                sm_scale=float(D**-0.5), sliding_window=None,
                logit_softcap=None)
        else:
            paged = write_kv(paged, k, v, meta.slot_mapping)
            o = ragged_paged_attention(
                q, paged, meta.block_tables, meta.query_start_loc,
                meta.seq_lens, sm_scale=float(D**-0.5),
                sliding_window=None, q_blk=q_blk)
        x = x + _dense(layer["o_proj"], o.reshape(T, H * D))
        # Cross-attention to the row's encoder slab.
        h = _ln(x, layer["cross_ln"])
        x = x + _cross_attention(cfg, layer, h, row_of, cross_k,
                                 cross_v, decode, seg_hint)
        h = _ln(x, layer["fc_ln"])
        h = jax.nn.gelu(_dense(layer["fc1"], h).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + _dense(layer["fc2"], h)
        new_caches.append((paged, cross_k, cross_v))
    x = _ln(x, params["norm"])
    return x, new_caches


def compute_logits(params: dict, cfg: ModelConfig,
                   hidden: jax.Array) -> jax.Array:
    return hidden @ params["embed_tokens"]["weight"].T


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = cfg.hidden_size
    I = cfg.intermediate_size
    ac = cfg.audio
    F = ac["max_source_positions"]

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    def lnp():
        return {"weight": jnp.ones((E, ), dtype),
                "bias": jnp.zeros((E, ), dtype)}

    def dense(i, o):
        return {"weight": w((i, o)), "bias": jnp.zeros((o, ), dtype)}

    enc_layers = [{
        "attn_ln": lnp(), "qkv_proj": dense(E, 3 * E),
        "o_proj": dense(E, E), "fc1": dense(E, I), "fc2": dense(I, E),
        "final_ln": lnp(),
    } for _ in range(ac["encoder_layers"])]
    layers = [{
        "self_ln": lnp(), "qkv_proj": dense(E, 3 * E),
        "o_proj": dense(E, E),
        "cross_ln": lnp(), "cross_q": dense(E, E),
        "cross_k": {"weight": w((E, E))}, "cross_v": dense(E, E),
        "cross_o": dense(E, E),
        "fc_ln": lnp(), "fc1": dense(E, I), "fc2": dense(I, E),
    } for _ in range(cfg.num_layers)]
    return {
        "audio_encoder": {
            "conv1": {"weight": w((E, ac["num_mel_bins"], 3)),
                      "bias": jnp.zeros((E, ), dtype)},
            "conv2": {"weight": w((E, E, 3)),
                      "bias": jnp.zeros((E, ), dtype)},
            "pos": w((F, E)),
            "layers": enc_layers,
            "ln": lnp(),
        },
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "dec_pos": w((cfg.max_model_len, E)),
        "layers": layers,
        "norm": lnp(),
    }
