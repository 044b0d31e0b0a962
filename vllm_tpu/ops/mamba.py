"""Mamba2 (SSD) mixer ops: functional state-space layer for serving.

Ref analog: vllm/model_executor/layers/mamba/mamba_mixer2.py +
csrc mamba kernels (selective_state_update, causal_conv1d). TPU-native
formulation over the engine's fixed-row persistent batch:

- State lives per *request row* (not per paged block): each layer
  carries ``(conv_state [R, K-1, conv_dim], ssm_state [R, nh, p, n]
  f32)`` threaded through the jitted step exactly like a KV cache
  (donated, updated in place by XLA).
- Decode (1 token per row) is fully vectorized over rows — the hot
  path is a handful of elementwise ops + one [R*nh, p, n] contraction.
- Ragged prefill runs a lax.scan over the flat token stream, carrying
  the full per-row state arrays; a token at position 0 resets its
  row's state (fresh request / preemption-resume reuse the row).
  Out-of-range rows (padding tokens) drop via scatter mode="drop".

The chunked-matmul SSD prefill (MXU-dense) is the known perf follow-up;
this scan form is exact and compiles to a static-shape while-loop.

Layer leaf schema (mamba mixer):
    in_proj:  {"weight": [E, 2*d_inner + 2*G*N + nh]}
    conv_w:   [K, conv_dim]   (depthwise kernel, conv_dim = d_inner+2GN)
    conv_b:   [conv_dim]      (optional)
    A_log:    [nh]
    D:        [nh]
    dt_bias:  [nh]
    mixer_norm: [d_inner]     (gated RMSNorm weight)
    out_proj: {"weight": [d_inner, E]}
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.linear import linear


class MambaState(NamedTuple):
    conv: jax.Array  # [R, K-1, conv_dim]
    ssm: jax.Array  # [R, nh, p, n] float32


def make_mamba_state(max_num_reqs: int, cfg: ModelConfig,
                     dtype) -> MambaState:
    d_inner = cfg.mamba_d_inner
    conv_dim = d_inner + 2 * cfg.mamba_n_groups * cfg.mamba_d_state
    nh = cfg.mamba_num_heads
    p = d_inner // nh
    return MambaState(
        conv=jnp.zeros((max_num_reqs, cfg.mamba_d_conv - 1, conv_dim),
                       dtype),
        ssm=jnp.zeros((max_num_reqs, nh, p, cfg.mamba_d_state),
                      jnp.float32),
    )


def _gated_rms_norm(y: jax.Array, gate: jax.Array, weight: jax.Array,
                    eps: float) -> jax.Array:
    """MambaRMSNormGated: norm(y * silu(gate)) * weight."""
    dtype = y.dtype
    yf = y.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
    var = jnp.mean(yf * yf, axis=-1, keepdims=True)
    return (yf * jax.lax.rsqrt(var + eps) *
            weight.astype(jnp.float32)).astype(dtype)


def _split_proj(cfg: ModelConfig, zxbcdt: jax.Array):
    d_inner = cfg.mamba_d_inner
    conv_dim = d_inner + 2 * cfg.mamba_n_groups * cfg.mamba_d_state
    gate = zxbcdt[..., :d_inner]
    xBC = zxbcdt[..., d_inner:d_inner + conv_dim]
    dt = zxbcdt[..., d_inner + conv_dim:]
    return gate, xBC, dt


def _ssm_step(cfg: ModelConfig, layer: dict, xBC: jax.Array,
              dt_raw: jax.Array, ssm: jax.Array):
    """One-token SSM update, batched over leading dims.

    xBC [.., conv_dim] (post-conv, activated), dt_raw [.., nh],
    ssm [.., nh, p, n] -> (y [.., d_inner], new ssm).
    """
    d_inner = cfg.mamba_d_inner
    N = cfg.mamba_d_state
    G = cfg.mamba_n_groups
    nh = cfg.mamba_num_heads
    p = d_inner // nh
    rep = nh // G
    lo, hi = cfg.mamba_time_step_limit

    x = xBC[..., :d_inner]
    B = xBC[..., d_inner:d_inner + G * N]
    C = xBC[..., d_inner + G * N:]

    A = -jnp.exp(layer["A_log"].astype(jnp.float32))  # [nh]
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) +
                         layer["dt_bias"].astype(jnp.float32))
    dt = jnp.clip(dt, lo, hi)  # [.., nh]
    dA = jnp.exp(dt * A)  # [.., nh]

    lead = x.shape[:-1]
    x_h = x.astype(jnp.float32).reshape(*lead, nh, p)
    B_h = jnp.repeat(B.astype(jnp.float32).reshape(*lead, G, N), rep,
                     axis=-2)  # [.., nh, N]
    C_h = jnp.repeat(C.astype(jnp.float32).reshape(*lead, G, N), rep,
                     axis=-2)

    new_ssm = (ssm * dA[..., None, None] +
               (dt[..., None] * x_h)[..., None] * B_h[..., None, :])
    y = jnp.einsum("...hpn,...hn->...hp", new_ssm, C_h)
    y = y + layer["D"].astype(jnp.float32)[:, None] * x_h
    return y.reshape(*lead, d_inner), new_ssm


def mamba2_mixer(
    cfg: ModelConfig,
    layer: dict,
    x: jax.Array,  # [T, E] ragged token stream
    positions: jax.Array,  # [T]
    state: MambaState,
    row_of: jax.Array,  # [T] request row per token (R = padding drop)
    decode_rows: bool,  # True: T == R and token t IS row t (decode)
) -> tuple[jax.Array, MambaState]:
    K = cfg.mamba_d_conv
    eps = cfg.rms_norm_eps

    zxbcdt = linear(layer["in_proj"], x)  # [T, ...]
    gate, xBC, dt_raw = _split_proj(cfg, zxbcdt)
    conv_w = layer["conv_w"].astype(jnp.float32)  # [K, conv_dim]
    conv_b = layer.get("conv_b")

    if decode_rows:
        # Vectorized single-token update for every row.
        reset = positions == 0
        conv_prev = jnp.where(reset[:, None, None], 0.0,
                              state.conv.astype(jnp.float32))
        ssm_prev = jnp.where(reset[:, None, None, None], 0.0, state.ssm)
        window = jnp.concatenate(
            [conv_prev, xBC.astype(jnp.float32)[:, None, :]], axis=1)
        conv_out = jnp.sum(window * conv_w[None], axis=1)
        if conv_b is not None:
            conv_out = conv_out + conv_b.astype(jnp.float32)
        xBC_act = jax.nn.silu(conv_out)
        y, new_ssm = _ssm_step(cfg, layer, xBC_act, dt_raw, ssm_prev)
        active = row_of < state.conv.shape[0]  # [R] real request rows
        new_state = MambaState(
            conv=jnp.where(active[:, None, None], window[:, 1:],
                           state.conv.astype(jnp.float32)).astype(
                               state.conv.dtype),
            ssm=jnp.where(active[:, None, None, None], new_ssm,
                          state.ssm),
        )
        return _out(cfg, layer, y, gate, eps), new_state

    # Ragged prefill: sequential scan over the flat stream.
    T = x.shape[0]
    R = state.conv.shape[0]

    def step(carry, t):
        conv_s, ssm_s = carry
        row = row_of[t]
        safe = jnp.minimum(row, R - 1)
        reset = positions[t] == 0
        c_prev = jnp.where(reset, 0.0,
                           conv_s[safe].astype(jnp.float32))
        s_prev = jnp.where(reset, 0.0, ssm_s[safe])
        window = jnp.concatenate(
            [c_prev, xBC[t].astype(jnp.float32)[None, :]], axis=0)
        conv_out = jnp.sum(window * conv_w, axis=0)
        if conv_b is not None:
            conv_out = conv_out + conv_b.astype(jnp.float32)
        xBC_act = jax.nn.silu(conv_out)
        y_t, ssm_new = _ssm_step(cfg, layer, xBC_act, dt_raw[t], s_prev)
        conv_s = conv_s.at[row].set(window[1:].astype(conv_s.dtype),
                                    mode="drop")
        ssm_s = ssm_s.at[row].set(ssm_new, mode="drop")
        return (conv_s, ssm_s), y_t

    (conv_s, ssm_s), ys = jax.lax.scan(
        step, (state.conv, state.ssm), jnp.arange(T, dtype=jnp.int32))
    return (_out(cfg, layer, ys, gate, eps),
            MambaState(conv=conv_s, ssm=ssm_s))


def _out(cfg, layer, y, gate, eps):
    y = _gated_rms_norm(y, gate, layer["mixer_norm"], eps)
    return linear(layer["out_proj"], y)
