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


def _chunked_delta(q, k, v, g, beta, init_s, row_of, is_start,
                   seg_start, reset_seg, L):
    """Chunked WY-form gated delta rule over the ragged stream.

    Ref analog: fla chunk_gated_delta_rule (HF torch_chunk_gated_
    delta_rule): within an L-token chunk the sequential forward
    substitution (I - A)^-1 (A = strictly-lower beta-key Gram matrix
    with decay) is computed as the nilpotent product
    (I+A)(I+A^2)(I+A^4)... — log2(L) batched MXU matmuls instead of
    an L-step loop — and one lax.scan passes states between chunks.
    Ragged streams use the same SEGMENT machinery as ops/mamba.py
    _prefill_chunked: pairwise terms are same-segment masked (decay
    differences cancel interleaved foreign tokens), per-(chunk, slot)
    entry states select densely from the per-row buffer, per-segment
    end states emit as (row, state) candidates, one gather at the end
    assembles the final per-row states. <= 8 segments per stream
    (runner seg hint; decode-heavy streams take the exact scan).
    Differentially tested against the per-token scan
    (tests/ops/test_gdn_chunked.py)."""
    T, Hv, Dk = k.shape
    Dv = v.shape[-1]
    R = init_s.shape[0]
    S_MAX = 8
    C = T // L
    idx_t = jnp.arange(T, dtype=jnp.int32)
    li = jnp.arange(L, dtype=jnp.int32)
    s_ar = jnp.arange(S_MAX, dtype=jnp.int32)
    r_ar = jnp.arange(R, dtype=jnp.int32)
    seg_id = jnp.cumsum(is_start.astype(jnp.int32))
    fresh_here = reset_seg & ((seg_start // L) == (idx_t // L))
    next_row = jnp.concatenate(
        [row_of[1:], jnp.full((1, ), -1, row_of.dtype)])
    is_last = row_of != next_row

    def resh(a):
        return a.reshape(C, L, *a.shape[1:])

    kb = k * beta[..., None]
    vb = v * beta[..., None]

    # Per-chunk slot structure (tiny host-side-shaped arrays).
    seg_c = resh(seg_id)
    row_c = resh(row_of)
    rst_c = resh(fresh_here)
    sl_all = jnp.clip(seg_c - seg_c[:, :1], 0, S_MAX - 1)  # [C, L]
    oh_all = sl_all[..., None] == s_ar  # [C, L, S]
    first_all = jnp.min(
        jnp.where(oh_all, li[None, :, None], L - 1), axis=1)  # [C, S]
    seg_row_all = jnp.take_along_axis(row_c, first_all, axis=1)
    seg_rst_all = jnp.take_along_axis(rst_c, first_all, axis=1)
    sel_all = ((seg_row_all[..., None] == r_ar)
               & ~seg_rst_all[..., None])  # [C, S, R]

    eyeL = jnp.eye(L, dtype=jnp.float32)
    tril_strict = (li[:, None] > li[None, :])
    tril_incl = (li[:, None] >= li[None, :])
    n_doublings = max((L - 1).bit_length() - 1, 0)

    def chunk_fn(S_run, inp):
        qc, kc, vbc, kbc, gc, seg, ist, rl, sel, srow = inp
        cum = jnp.cumsum(gc, axis=0)  # [L, Hv]
        start_local = (li == 0) | (seg != jnp.concatenate(
            [seg[:1], seg[:-1]]))
        sidx = jax.lax.cummax(jnp.where(start_local, li, 0))
        base = jnp.where((sidx > 0)[:, None],
                         cum[jnp.clip(sidx - 1, 0, L - 1)], 0.0)
        same = seg[:, None] == seg[None, :]
        dec = jnp.exp(jnp.minimum(cum[:, None] - cum[None, :],
                                  0.0)).transpose(2, 0, 1)  # [Hv,L,L]
        A = -(jnp.einsum("ihd,jhd->hij", kbc, kc,
                         preferred_element_type=jnp.float32) * dec)
        A = A * (same & tril_strict)[None]
        # (I - A)^-1 via nilpotent doubling.
        Tm = eyeL[None] + A
        Ap = A
        for _ in range(n_doublings):
            Ap = jnp.einsum("hij,hjk->hik", Ap, Ap)
            Tm = jnp.einsum("hij,hjk->hik", Tm, eyeL[None] + Ap)
        exp_ib = jnp.exp(cum - base)  # [L, Hv] decay from seg entry
        v_tr = jnp.einsum("hij,jhv->ihv", Tm, vbc)
        W = jnp.einsum("hij,jhd->ihd", Tm, kbc * exp_ib[..., None])
        # Per-slot entry states; slot 0 may continue the running
        # segment from the previous chunk.
        prev = jnp.einsum("sr,rhdv->shdv", sel.astype(jnp.float32),
                          init_s)
        continues = ~ist[0]
        prev = jnp.where(((s_ar == 0) & continues)[:, None, None, None],
                         S_run[None], prev)
        sl = jnp.clip(seg - seg[0], 0, S_MAX - 1)
        v_pr = jnp.take_along_axis(
            jnp.einsum("ihd,shdv->sihv", W, prev),
            sl[None, :, None, None], axis=0)[0]
        v_new = v_tr - v_pr
        o_inter = jnp.take_along_axis(
            jnp.einsum("ihd,shdv->sihv", qc * exp_ib[..., None], prev),
            sl[None, :, None, None], axis=0)[0]
        M = (jnp.einsum("ihd,jhd->hij", qc, kc,
                        preferred_element_type=jnp.float32) * dec *
             (same & tril_incl)[None])
        o_intra = jnp.einsum("hij,jhv->ihv", M, v_new)
        # Per-segment end states.
        oh = sl[:, None] == s_ar  # [L, S]
        last = jnp.max(jnp.where(oh, li[:, None], 0), axis=0)  # [S]
        cum_last = cum[last]  # [S, Hv]
        u = jnp.exp(jnp.minimum(cum_last[sl] - cum, 0.0))  # [L, Hv]
        S_add = jnp.einsum("ls,lhd,lhv->shdv", oh.astype(jnp.float32),
                           kc * u[..., None], v_new)
        S_new = prev * exp_ib[last][..., None, None] + S_add
        n_seg = seg[-1] - seg[0]
        ends = rl[last]
        cand_rows = jnp.where((s_ar <= n_seg) & (srow < R) & ends,
                              srow, R)
        new_run = S_new[jnp.clip(n_seg, 0, S_MAX - 1)]
        return new_run, (cand_rows, S_new, o_inter + o_intra)

    run0 = jnp.zeros(init_s.shape[1:], jnp.float32)
    _, (cand_rows, cand_states, os_) = jax.lax.scan(
        chunk_fn, run0,
        (resh(q), resh(k), resh(vb), resh(kb), resh(g), seg_c,
         resh(is_start), resh(is_last), sel_all, seg_row_all))

    # Assemble final per-row states (same as ops/mamba.py).
    Kc = C * S_MAX
    rows_flat = cand_rows.reshape(Kc)
    states_flat = cand_states.reshape((Kc, ) + init_s.shape[1:])
    match = rows_flat[None, :] == r_ar[:, None]
    found = jnp.any(match, axis=1)
    last_k = Kc - 1 - jnp.argmax(match[:, ::-1], axis=1)
    sel_last = match & (jnp.arange(Kc)[None, :] == last_k[:, None])
    gathered = jnp.einsum("rk,khdv->rhdv", sel_last.astype(jnp.float32),
                          states_flat)
    s_final = jnp.where(found[:, None, None, None], gathered, init_s)
    return os_.reshape(T, Hv, Dv), s_final


def gdn_mixer(
    cfg: ModelConfig,
    layer: dict,
    x: jax.Array,  # [T, E]
    positions: jax.Array,
    state: GDNState,
    row_of: jax.Array,
    decode_rows: bool,
    few_segments: bool = True,
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

    # Ragged prefill. Chunked WY form when the stream length chunks
    # cleanly AND the host certifies few segments (runner seg hint) —
    # MXU-dense intra-chunk matmuls, O(T/L) sequential steps (ref
    # analog: fla chunk_gated_delta_rule / torch_chunk_gated_delta_
    # rule). Decode-heavy mixed streams take the exact per-token scan.
    T = x.shape[0]
    chunk = next((L for L in (64, 32, 16) if T % L == 0), None)
    if chunk is not None and few_segments:
        reset = positions == 0
        conv_prev_rows = state.conv.astype(jnp.float32)
        # Depthwise conv over the ragged stream: K-1 shifted masked
        # adds with per-row carry splicing (same construction as
        # ops/mamba.py _prefill_chunked).
        idx_t = jnp.arange(T, dtype=jnp.int32)
        safe_row = jnp.minimum(row_of, R - 1)
        prev_row = jnp.concatenate(
            [jnp.full((1, ), -1, row_of.dtype), row_of[:-1]])
        is_start = ((idx_t == 0) | (row_of != prev_row)
                    | (reset & (row_of < R)))
        seg_start = jax.lax.cummax(jnp.where(is_start, idx_t, 0))
        m = idx_t - seg_start
        reset_seg = positions[seg_start] == 0
        from vllm_tpu.ops.mamba import (conv_windows_at_last,
                                        ragged_causal_conv)
        xf = mixed.astype(jnp.float32)
        conv_out, exts = ragged_causal_conv(
            xf, conv_prev_rows, conv_w, safe_row, m, reset_seg,
            positions)
        conv_act = jax.nn.silu(conv_out)
        qn, kn, vc = qkv_from_conv(conv_act)
        o, s_new = _chunked_delta(qn, kn, vc, g, beta, state.s,
                                  row_of, is_start, seg_start,
                                  reset_seg, chunk)
        # New conv windows at each row's last token.
        next_row = jnp.concatenate(
            [row_of[1:], jnp.full((1, ), -1, row_of.dtype)])
        is_last = row_of != next_row
        r_ar = jnp.arange(R, dtype=jnp.int32)
        row_last = jnp.max(
            jnp.where((row_of[None, :] == r_ar[:, None])
                      & is_last[None, :], idx_t[None, :], -1), axis=1)
        has_last = row_last >= 0
        gidx = jnp.clip(row_last, 0, T - 1)
        conv_new = conv_windows_at_last(exts, gidx, has_last,
                                        state.conv)
        return (_norm_gate_out(cfg, layer, o, z, x.dtype),
                GDNState(conv=conv_new, s=s_new))

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
