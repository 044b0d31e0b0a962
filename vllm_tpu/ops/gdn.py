"""Gated DeltaNet (GDN) linear-attention mixer — Qwen3-Next.

Ref analog: vllm/v1/attention/backends/gdn_attn.py + the fla-org
chunk_gated_delta_rule kernels the reference wraps; math per HF
Qwen3NextGatedDeltaNet (torch_recurrent_gated_delta_rule):

    S_t = S_{t-1} * exp(g_t)                       (per-v-head decay)
    kv  = k_t . S_t                                (memory readout)
    S_t += k_t (x) ((v_t - kv) * beta_t)           (delta update)
    o_t = q_t . S_t

with l2-normalized q/k, q scaled by dk^-0.5, beta = sigmoid(b),
g = -exp(A_log) * softplus(a + dt_bias), then a norm-THEN-gate RMS
(weight over head_v_dim, silu(z) gate — note: the OPPOSITE order of
mamba2's gate-then-norm) and out_proj.

TPU-native serving shape mirrors ops/mamba.py: state lives per
request ROW ((conv [R, K-1, conv_dim], S [R, Hv, Dk, Dv] f32))
threaded through the jitted step like a KV cache; decode is one
vectorized delta-rule step over rows; ragged prefill runs a per-token
lax.scan (exact; the chunked WY-form is the follow-up optimization
and the reference's torch fallback is this same sequential rule).

Layer leaf schema (gdn mixer):
    in_proj_qkvz {weight [E, 2*Kd + 2*Vd]}   (head-interleaved, HF)
    in_proj_ba   {weight [E, 2*Hv]}
    conv_w       [K, conv_dim]      (conv_dim = 2*Kd + Vd; no bias)
    A_log        [Hv]   dt_bias [Hv]
    gdn_norm     [Dv]               (gated RMSNorm weight)
    out_proj     {weight [Vd, E]}
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.linear import linear


class GDNState(NamedTuple):
    conv: jax.Array  # [R, K-1, conv_dim]
    s: jax.Array  # [R, Hv, Dk, Dv] float32


def make_gdn_state(max_num_reqs: int, cfg: ModelConfig,
                   dtype) -> GDNState:
    g = cfg.gdn
    conv_dim = 2 * g["num_k_heads"] * g["head_k_dim"] + \
        g["num_v_heads"] * g["head_v_dim"]
    return GDNState(
        conv=jnp.zeros((max_num_reqs, g["conv_kernel"] - 1, conv_dim),
                       dtype),
        s=jnp.zeros((max_num_reqs, g["num_v_heads"], g["head_k_dim"],
                     g["head_v_dim"]), jnp.float32),
    )


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, -1, keepdims=True) + eps)


def _split_qkvz_ba(cfg: ModelConfig, qkvz: jax.Array, ba: jax.Array):
    """HF head-interleaved ordering (fix_query_key_value_ordering):
    per k-head block = [q Dk | k Dk | v R*Dv | z R*Dv], ba block =
    [b R | a R] with R = Hv//Hk."""
    g = cfg.gdn
    Hk, Hv = g["num_k_heads"], g["num_v_heads"]
    Dk, Dv = g["head_k_dim"], g["head_v_dim"]
    R = Hv // Hk
    lead = qkvz.shape[:-1]
    blk = qkvz.reshape(*lead, Hk, 2 * Dk + 2 * R * Dv)
    q = blk[..., :Dk]
    k = blk[..., Dk:2 * Dk]
    v = blk[..., 2 * Dk:2 * Dk + R * Dv].reshape(*lead, Hv, Dv)
    z = blk[..., 2 * Dk + R * Dv:].reshape(*lead, Hv, Dv)
    bab = ba.reshape(*lead, Hk, 2 * R)
    b = bab[..., :R].reshape(*lead, Hv)
    a = bab[..., R:].reshape(*lead, Hv)
    return q, k, v, z, b, a


def _gates(layer, b, a):
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = (-jnp.exp(layer["A_log"].astype(jnp.float32)) *
         jax.nn.softplus(a.astype(jnp.float32) +
                         layer["dt_bias"].astype(jnp.float32)))
    return beta, g


def _delta_step(q, k, v, g, beta, s):
    """One delta-rule step, batched over leading dims.
    q/k [.., Hv, Dk] (l2-normed; q scaled), v [.., Hv, Dv],
    g/beta [.., Hv], s [.., Hv, Dk, Dv]."""
    s = s * jnp.exp(g)[..., None, None]
    kv = jnp.einsum("...hd,...hdv->...hv", k, s)
    delta = (v - kv) * beta[..., None]
    s = s + k[..., :, None] * delta[..., None, :]
    o = jnp.einsum("...hd,...hdv->...hv", q, s)
    return o, s


def _norm_gate_out(cfg, layer, o, z, dtype):
    """Norm-then-gate RMS over head_v_dim + out projection."""
    of = o.astype(jnp.float32)
    var = jnp.mean(of * of, -1, keepdims=True)
    of = (of * jax.lax.rsqrt(var + cfg.rms_norm_eps) *
          layer["gdn_norm"].astype(jnp.float32))
    of = of * jax.nn.silu(z.astype(jnp.float32))
    lead = of.shape[:-2]
    return linear(layer["out_proj"],
                  of.reshape(*lead, -1).astype(dtype))


def gdn_mixer(
    cfg: ModelConfig,
    layer: dict,
    x: jax.Array,  # [T, E]
    positions: jax.Array,
    state: GDNState,
    row_of: jax.Array,
    decode_rows: bool,
) -> tuple[jax.Array, GDNState]:
    g_cfg = cfg.gdn
    Hk, Hv = g_cfg["num_k_heads"], g_cfg["num_v_heads"]
    Dk, Dv = g_cfg["head_k_dim"], g_cfg["head_v_dim"]
    K = g_cfg["conv_kernel"]
    R_rep = Hv // Hk
    key_dim = Hk * Dk
    scale = Dk**-0.5

    qkvz = linear(layer["in_proj_qkvz"], x)
    ba = linear(layer["in_proj_ba"], x)
    q, k, v, z, b, a = _split_qkvz_ba(cfg, qkvz, ba)
    lead = x.shape[:-1]
    mixed = jnp.concatenate(
        [q.reshape(*lead, key_dim), k.reshape(*lead, key_dim),
         v.reshape(*lead, Hv * Dv)], axis=-1)  # [T, conv_dim]
    conv_w = layer["conv_w"].astype(jnp.float32)
    R = state.conv.shape[0]
    beta, g = _gates(layer, b, a)

    def qkv_from_conv(conv_out):
        qc = conv_out[..., :key_dim].reshape(*conv_out.shape[:-1], Hk,
                                             Dk)
        kc = conv_out[..., key_dim:2 * key_dim].reshape(
            *conv_out.shape[:-1], Hk, Dk)
        vc = conv_out[..., 2 * key_dim:].reshape(
            *conv_out.shape[:-1], Hv, Dv)
        qn = jnp.repeat(_l2norm(qc), R_rep, axis=-2) * scale
        kn = jnp.repeat(_l2norm(kc), R_rep, axis=-2)
        return qn, kn, vc.astype(jnp.float32)

    if decode_rows:
        reset = positions == 0
        conv_prev = jnp.where(reset[:, None, None], 0.0,
                              state.conv.astype(jnp.float32))
        s_prev = jnp.where(reset[:, None, None, None], 0.0, state.s)
        window = jnp.concatenate(
            [conv_prev, mixed.astype(jnp.float32)[:, None, :]], axis=1)
        conv_out = jax.nn.silu(jnp.sum(window * conv_w[None], axis=1))
        qn, kn, vc = qkv_from_conv(conv_out)
        o, s_new = _delta_step(qn, kn, vc, g, beta, s_prev)
        active = row_of < R
        new_state = GDNState(
            conv=jnp.where(active[:, None, None], window[:, 1:],
                           state.conv.astype(jnp.float32)).astype(
                               state.conv.dtype),
            s=jnp.where(active[:, None, None, None], s_new, state.s),
        )
        return _norm_gate_out(cfg, layer, o, z, x.dtype), new_state

    # Ragged prefill: exact per-token scan (the reference's torch
    # fallback is the same sequential rule; chunked WY-form is the
    # optimization TODO).
    T = x.shape[0]

    def step(carry, t):
        conv_s, s_s = carry
        row = row_of[t]
        safe = jnp.minimum(row, R - 1)
        reset = positions[t] == 0
        c_prev = jnp.where(reset, 0.0, conv_s[safe].astype(jnp.float32))
        s_prev = jnp.where(reset, 0.0, s_s[safe])
        window = jnp.concatenate(
            [c_prev, mixed[t].astype(jnp.float32)[None, :]], axis=0)
        conv_out = jax.nn.silu(jnp.sum(window * conv_w, axis=0))
        qn, kn, vc = qkv_from_conv(conv_out)
        o_t, s_new = _delta_step(qn, kn, vc, g[t], beta[t], s_prev)
        conv_s = conv_s.at[row].set(window[1:].astype(conv_s.dtype),
                                    mode="drop")
        s_s = s_s.at[row].set(s_new, mode="drop")
        return (conv_s, s_s), o_t

    (conv_s, s_s), os_ = jax.lax.scan(
        step, (state.conv, state.s), jnp.arange(T, dtype=jnp.int32))
    return (_norm_gate_out(cfg, layer, os_, z, x.dtype),
            GDNState(conv=conv_s, s=s_s))
