"""Elementwise layer ops: RMSNorm, rotary embedding, activations.

Pure jnp — XLA fuses these into neighboring matmuls on TPU, so unlike
the reference (which needs CUDA kernels: layernorm_kernels.cu,
pos_encoding_kernels.cu, activation_kernels.cu in csrc/libtorch_stable)
no hand-written kernel is warranted until profiling says otherwise
(SURVEY.md §2.8 "fuse into model jit").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in fp32 accumulation (HF llama semantics: normalize in
    fp32, cast back, then scale)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * weight).astype(dtype)


def rope_inv_freq(cfg: ModelConfig) -> jax.Array:
    """Rotary inverse frequencies, with llama3-style scaling support
    (ref analog: vllm/model_executor/layers/rotary_embedding/)."""
    d = int(round(cfg.head_dim * cfg.partial_rotary_factor))
    inv_freq = 1.0 / (cfg.rope_theta**(jnp.arange(0, d, 2,
                                                  dtype=jnp.float32) / d))
    rs = cfg.rope_scaling or {}
    rope_type = rs.get("rope_type", rs.get("type"))
    if rope_type == "llama3":
        factor = rs["factor"]
        low = rs["low_freq_factor"]
        high = rs["high_freq_factor"]
        old_len = rs["original_max_position_embeddings"]
        wavelen = 2 * jnp.pi / inv_freq
        # Three bands: high-freq kept, low-freq scaled, middle smoothed.
        smooth = (old_len / wavelen - low) / (high - low)
        scaled = jnp.where(
            wavelen < old_len / high, inv_freq,
            jnp.where(wavelen > old_len / low, inv_freq / factor,
                      (1 - smooth) * inv_freq / factor + smooth * inv_freq))
        inv_freq = scaled
    elif rope_type == "linear":
        inv_freq = inv_freq / rs["factor"]
    elif rope_type == "yarn":
        inv_freq = _yarn_inv_freq(inv_freq, d, cfg, rs)
    elif rope_type == "dynamic":
        # Dynamic NTK at full extension (static-shape serving bakes
        # the max-length base; ref: _compute_dynamic_ntk_parameters at
        # seq_len = max_position_embeddings * factor).
        factor = rs["factor"]
        mult = factor * factor - factor + 1.0
        base = cfg.rope_theta * mult**(d / (d - 2))
        inv_freq = 1.0 / (base**(jnp.arange(0, d, 2, dtype=jnp.float32) /
                                 d))
    elif rope_type in ("longrope", "su"):
        # Phi-3 LongRoPE (ref: rotary_embedding/ phi3 long rope +
        # HF _compute_longrope_parameters): per-dim rescale factors,
        # short set inside the original window, long set beyond.
        orig = (rs.get("original_max_position_embeddings")
                or cfg.max_model_len)
        fac = (rs["short_factor"] if cfg.max_model_len <= orig
               else rs["long_factor"])
        inv_freq = inv_freq / jnp.asarray(fac, jnp.float32)
    elif rope_type in (None, "default"):
        pass
    else:
        raise NotImplementedError(f"rope_type {rope_type}")
    return inv_freq


def _yarn_inv_freq(inv_freq: jax.Array, d: int, cfg: ModelConfig,
                   rs: dict) -> jax.Array:
    """YaRN (ref: HF _compute_yarn_parameters / vllm yarn rotary):
    per-dim interpolation/extrapolation blend over a linear ramp
    between the beta_fast/beta_slow rotation boundaries."""
    import math
    factor = rs["factor"]
    old_len = (rs.get("original_max_position_embeddings")
               or cfg.max_model_len)
    beta_fast = rs.get("beta_fast") or 32
    beta_slow = rs.get("beta_slow") or 1
    base = cfg.rope_theta

    def corr_dim(rot):
        return (d * math.log(old_len / (rot * 2 * math.pi)) /
                (2 * math.log(base)))

    low = max(math.floor(corr_dim(beta_fast)), 0)
    high = min(math.ceil(corr_dim(beta_slow)), d - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip(
        (jnp.arange(d // 2, dtype=jnp.float32) - low) / (high - low), 0,
        1)
    extrap_factor = 1.0 - ramp
    return (inv_freq / factor * (1 - extrap_factor) +
            inv_freq * extrap_factor)


def yarn_attention_factor(cfg: ModelConfig) -> float:
    """cos/sin magnitude scale for yarn (HF attention_scaling; deepseek
    uses the mscale/mscale_all_dim ratio) and longrope (sqrt-log
    extension factor)."""
    import math
    rs = cfg.rope_scaling or {}
    rt = rs.get("rope_type", rs.get("type"))
    if rt in ("longrope", "su"):
        if rs.get("attention_factor") is not None:
            return float(rs["attention_factor"])
        orig = (rs.get("original_max_position_embeddings")
                or cfg.max_model_len)
        ext = (cfg.hf_config or {}).get("max_position_embeddings",
                                        cfg.max_model_len) / orig
        return (1.0 if ext <= 1.0 else
                math.sqrt(1.0 + math.log(ext) / math.log(orig)))
    if rt != "yarn":
        return 1.0
    if rs.get("attention_factor") is not None:
        return float(rs["attention_factor"])

    def get_mscale(scale, m=1.0):
        return 0.1 * m * math.log(scale) + 1.0 if scale > 1 else 1.0

    factor = rs["factor"]
    mscale, mscale_all = rs.get("mscale"), rs.get("mscale_all_dim")
    if mscale and mscale_all:
        return float(get_mscale(factor, mscale) /
                     get_mscale(factor, mscale_all))
    return float(get_mscale(factor))


def rope_cos_sin(positions: jax.Array,
                 cfg: ModelConfig) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for a batch of positions: each [T, head_dim//2],
    scaled by the yarn attention factor when configured."""
    inv_freq = rope_inv_freq(cfg)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    s = yarn_attention_factor(cfg)
    return jnp.cos(freqs) * s, jnp.sin(freqs) * s


def mrope_cos_sin(positions3: jax.Array,
                  cfg: ModelConfig) -> tuple[jax.Array, jax.Array]:
    """Multimodal 3D RoPE tables (Qwen2-VL mrope).

    positions3: [3, T] (temporal / height / width position rows; text
    tokens carry the same value in all three). rope_scaling's
    ``mrope_section`` splits the head_dim/2 frequency channels among
    the three axes (ref analog: apply_multimodal_rotary_pos_emb,
    HF modeling_qwen2_vl + vllm rotary_embedding mrope). Equal rows
    reduce exactly to 1-D RoPE, so text-only requests and decode
    steps use rope_cos_sin at (position + mrope_delta) instead.
    """
    inv_freq = rope_inv_freq(cfg)
    sections = tuple(cfg.rope_scaling["mrope_section"])
    freqs = (positions3.astype(jnp.float32)[:, :, None] *
             inv_freq[None, None, :])  # [3, T, d/2]
    cos3, sin3 = jnp.cos(freqs), jnp.sin(freqs)
    cs, sn, off = [], [], 0
    for i, sec in enumerate(sections):
        cs.append(cos3[i % 3, :, off:off + sec])
        sn.append(sin3[i % 3, :, off:off + sec])
        off += sec
    return jnp.concatenate(cs, -1), jnp.concatenate(sn, -1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """NeoX-style (half-rotated) RoPE. x: [T, heads, head_dim].

    Partial rotary (cos dim < head_dim/2): only the leading
    ``2 * cos.shape[-1]`` dims rotate, the rest pass through
    (ref analog: rotary_embedding partial_rotary_factor)."""
    rd = 2 * cos.shape[-1]
    if rd < x.shape[-1]:
        return jnp.concatenate(
            [apply_rope(x[..., :rd], cos, sin), x[..., rd:]], axis=-1)
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * c - xf2 * s, xf2 * c + xf1 * s], axis=-1).astype(x.dtype)


def rope_cos_sin_dim(positions: jax.Array, dim: int, theta: float,
                     scaling: float = 1.0
                     ) -> tuple[jax.Array, jax.Array]:
    """cos/sin for an explicit rotary dim (MLA uses qk_rope_head_dim,
    not head_dim): each [T, dim//2], scaled by ``scaling`` (yarn
    attention_scaling / mscale factor)."""
    inv_freq = 1.0 / (theta**(jnp.arange(0, dim, 2, dtype=jnp.float32) /
                              dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs) * scaling, jnp.sin(freqs) * scaling


def apply_rope_interleaved(x: jax.Array, cos: jax.Array,
                           sin: jax.Array) -> jax.Array:
    """GPT-J-style (interleaved-pair) RoPE: pairs are (2i, 2i+1).
    x: [T, heads, d]. DeepSeek's HF impl rotates this way
    (apply_rotary_emb via view_as_complex)."""
    T = x.shape[0]
    d2 = x.shape[-1] // 2
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], d2, 2)
    x1, x2 = xr[..., 0], xr[..., 1]
    c = cos.reshape(T, *([1] * (x.ndim - 2)), d2)
    s = sin.reshape(T, *([1] * (x.ndim - 2)), d2)
    out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """SiluAndMul over a fused [.., 2*I] gate_up projection (ref analog:
    vllm activation.py SiluAndMul)."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up
