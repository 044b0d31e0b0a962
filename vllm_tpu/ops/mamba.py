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
- Ragged prefill runs the CHUNKED SSD formulation (ref analog: the
  mamba2 chunk-scan kernels, csrc/libtorch_stable/mamba/ +
  vllm/v1/attention/backends/mamba2_attn.py): the stream is cut into
  L-token chunks, each chunk does dense intra-chunk matmuls on the
  MXU (an attention-like [L, L] decay-masked score against a segment
  mask, so multiple requests can share a chunk), and a short
  lax.scan passes per-row states between chunks — O(T/L) sequential
  steps instead of O(T). A token at position 0 resets its row's
  state (fresh request / preemption-resume reuse the row);
  continuations gather the carried state. The depthwise conv is
  evaluated stream-wide with K-1 shifted masked adds (carry values
  spliced where a window crosses into the previous engine step).
  The per-token scan form is kept as ``_prefill_scan`` — the exact
  reference the chunked path is differentially tested against, and
  the fallback for chunk-unfriendly T.

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
    few_segments: bool = True,  # static: stream has <= 8 segments
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

    # Ragged prefill: chunked SSD when the stream length allows AND
    # the host certifies few segments (the compressed per-segment
    # slots hold up to 8 — the runner's seg hint; see worker/runner
    # prepare_inputs). Decode-heavy mixed streams take the exact
    # per-token scan.
    T = x.shape[0]
    chunk = next((L for L in (256, 128, 64, 32, 16) if T % L == 0),
                 None)
    if chunk is not None and few_segments:
        y, new_state = _prefill_chunked(cfg, layer, xBC, dt_raw,
                                        positions, state, row_of,
                                        chunk)
        return _out(cfg, layer, y, gate, eps), new_state
    return _prefill_scan(cfg, layer, xBC, dt_raw, gate, positions,
                         state, row_of, eps)


def _prefill_scan(cfg, layer, xBC, dt_raw, gate, positions, state,
                  row_of, eps):
    """Exact per-token reference: lax.scan over the flat stream."""
    T = xBC.shape[0]
    R = state.conv.shape[0]
    conv_w = layer["conv_w"].astype(jnp.float32)
    conv_b = layer.get("conv_b")

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


def ragged_causal_conv(xf, conv_state_rows, conv_w, safe_row, m,
                       reset_seg, positions):
    """Depthwise causal conv over a ragged stream as K-1 shifted
    masked adds, splicing each row's carried conv state where a
    window crosses into the previous engine step (shared by the
    mamba2-SSD, mamba1 and GDN chunked prefills).

    xf [T, C] f32 stream; conv_state_rows [R, K-1, C] f32;
    conv_w [K, C]; m = in-segment offset per token; reset_seg /
    positions gate the carry. Returns (conv_out [T, C] pre-bias/act,
    exts) where exts[j] is the value of "token at stream offset -j"
    (j < K-1) — the inputs to conv_windows_at_last."""
    K = conv_w.shape[0]
    conv_out = xf * conv_w[K - 1]
    exts = [xf]
    for k in range(1, K):
        shifted = jnp.roll(xf, k, axis=0)
        in_stream = m >= k
        carry_idx = jnp.clip((K - 1) - (k - m), 0, K - 2)
        cv = conv_state_rows[safe_row, carry_idx]
        use_carry = (~in_stream) & (~reset_seg) & (positions - k >= 0)
        ext = jnp.where(in_stream[:, None], shifted,
                        jnp.where(use_carry[:, None], cv, 0.0))
        conv_out = conv_out + ext * conv_w[K - 1 - k]
        if k <= K - 2:
            exts.append(ext)
    return conv_out, exts


def conv_windows_at_last(exts, gidx, has_last, old_conv):
    """New per-row conv windows gathered at each row's last token
    (oldest -> newest); rows with no token keep their old state."""
    new_win = jnp.stack([ext[gidx] for ext in exts][::-1], axis=1)
    return jnp.where(has_last[:, None, None],
                     new_win.astype(old_conv.dtype), old_conv)


def _prefill_chunked(cfg, layer, xBC, dt_raw, positions, state,
                     row_of, L):
    """Chunked SSD prefill (ref analog: csrc/libtorch_stable/mamba/
    chunk-scan + mamba2_attn.py): dense MXU math within L-token
    chunks, a T/L-step lax.scan across them.

    The ragged stream is handled with SEGMENT masks (a segment = one
    request's contiguous run, cut at position-0 resets), so chunks may
    mix requests freely:

    - intra-chunk: attention-like scores
      ``C_i.B_j * exp(cum_i - cum_j)`` masked to same-segment causal
      pairs (the cumulative log-decay of interleaved foreign tokens
      cancels in the difference);
    - inter-chunk: each token decays its row's carried state by
      ``exp(cum_i - cum[segment entry])``; fresh segments (position
      0) zero the gather;
    - each row's state is re-scattered at its last token per chunk,
      so segments spanning chunks (or engine steps) chain exactly.

    Matches ``_prefill_scan`` to float tolerance (differential test:
    tests/models/test_mamba2_vs_hf.py)."""
    T = xBC.shape[0]
    R, Km1, conv_dim = state.conv.shape
    K = Km1 + 1
    d_inner = cfg.mamba_d_inner
    N = cfg.mamba_d_state
    G = cfg.mamba_n_groups
    nh = cfg.mamba_num_heads
    p = d_inner // nh
    rep = nh // G
    lo, hi = cfg.mamba_time_step_limit
    xf = xBC.astype(jnp.float32)
    idx_t = jnp.arange(T, dtype=jnp.int32)
    safe_row = jnp.minimum(row_of, R - 1)

    # Segment structure: starts at stream head, row changes, resets.
    prev_row = jnp.concatenate(
        [jnp.full((1, ), -1, row_of.dtype), row_of[:-1]])
    # (Padding tokens — row >= R — collapse into ONE trailing
    # segment so the per-chunk segment count stays bounded by the
    # scheduled-request count, which the runner's seg hint certifies.)
    is_start = ((idx_t == 0) | (row_of != prev_row)
                | ((positions == 0) & (row_of < R)))
    seg_start = jax.lax.cummax(jnp.where(is_start, idx_t, 0))
    m = idx_t - seg_start  # in-segment offset
    reset_seg = positions[seg_start] == 0  # [T]

    # Depthwise causal conv: K-1 shifted masked adds; windows that
    # cross into the previous engine step splice the carried per-row
    # conv state (newest carry entry = position seg_start_pos - 1).
    # Carry values gather with a direct (row, slot) double index —
    # never materializing a [T, K-1, conv_dim] per-token copy of the
    # carry buffer.
    conv_w = layer["conv_w"].astype(jnp.float32)  # [K, conv_dim]
    conv_out, exts = ragged_causal_conv(
        xf, state.conv.astype(jnp.float32), conv_w, safe_row, m,
        reset_seg, positions)
    conv_b = layer.get("conv_b")
    if conv_b is not None:
        conv_out = conv_out + conv_b.astype(jnp.float32)
    xBC_act = jax.nn.silu(conv_out)

    # New conv state at each row's last token: entries oldest->newest
    # are the values at positions pos_last-(Km1-1) .. pos_last.
    # (Scatters with data-dependent indices serialize into while
    # loops on TPU, so the update is formulated as a per-ROW gather:
    # find each row's last token densely, then gather its window.)
    next_row = jnp.concatenate(
        [row_of[1:], jnp.full((1, ), -1, row_of.dtype)])
    is_last = row_of != next_row
    r_ar = jnp.arange(R, dtype=jnp.int32)
    row_last = jnp.max(
        jnp.where((row_of[None, :] == r_ar[:, None]) & is_last[None, :],
                  idx_t[None, :], -1), axis=1)  # [R] or -1
    has_last = row_last >= 0
    gidx = jnp.clip(row_last, 0, T - 1)
    new_conv = conv_windows_at_last(exts, gidx, has_last, state.conv)

    # SSM inputs.
    x_h = xBC_act[:, :d_inner].reshape(T, nh, p)
    B_h = jnp.repeat(
        xBC_act[:, d_inner:d_inner + G * N].reshape(T, G, N), rep,
        axis=1)
    C_h = jnp.repeat(xBC_act[:, d_inner + G * N:].reshape(T, G, N),
                     rep, axis=1)
    A = -jnp.exp(layer["A_log"].astype(jnp.float32))  # [nh]
    dt = jnp.clip(
        jax.nn.softplus(dt_raw.astype(jnp.float32) +
                        layer["dt_bias"].astype(jnp.float32)), lo, hi)
    logdA = dt * A  # [T, nh], <= 0 so every exp below is <= 1
    dx = dt[..., None] * x_h  # [T, nh, p]
    seg_id = jnp.cumsum(is_start.astype(jnp.int32))
    # MXU compute dtype for the chunk matmuls: the model's stream
    # dtype (bf16 in production — softmax-free SSD scores tolerate it
    # like attention does; f32 under the f32 CPU tests so the
    # differential-vs-scan checks stay tight). States/decays stay f32.
    cd = xBC.dtype

    C = T // L
    # Zero the inter-chunk carry gather only in the chunk where a
    # fresh (position-0) segment actually STARTS; later chunks of the
    # same segment read the buffer refreshed at the previous chunk's
    # end.
    fresh_here = reset_seg & ((seg_start // L) == (idx_t // L))

    def resh(a):
        return a.reshape(C, L, *a.shape[1:])

    # Per-SEGMENT state handling + (segment, token)-dense einsums,
    # with NO scatter into an [R] state buffer inside the scan (TPU
    # serializes dynamic-index scatters into while loops — measured
    # 10x the arithmetic cost — and a lax.cond fallback is useless:
    # XLA's conditional-to-select pass runs BOTH branches). The scan
    # carries only the RUN state — at any chunk boundary exactly one
    # segment is in flight, since the ragged stream is contiguous per
    # request. Cross-STEP continuations read the loop-invariant
    # step-entry buffer; each chunk EMITS its per-slot end states and
    # one parallel gather after the scan assembles the final per-row
    # buffer. The caller guarantees <= S_MAX segments per stream
    # (mamba2_mixer routes decode-heavy streams to the exact scan).
    S_MAX = 8
    init_ssm = state.ssm  # loop-invariant step-entry states
    s_ar = jnp.arange(S_MAX, dtype=jnp.int32)
    r_ar = jnp.arange(R, dtype=jnp.int32)

    # Per-(chunk, slot) entry states, selected OUTSIDE the scan with
    # one dense one-hot matmul: a dynamic row gather lowers to a
    # serialized while loop on TPU (measured ~0.5 ms per row!), while
    # the one-hot contraction rides the MXU. Reset segments select
    # nothing and come out zero.
    li = jnp.arange(L, dtype=jnp.int32)
    seg_c = resh(seg_id)  # [C, L]
    row_c = resh(row_of)
    rst_c = resh(fresh_here)
    sl_all = jnp.clip(seg_c - seg_c[:, :1], 0, S_MAX - 1)  # [C, L]
    oh_all = sl_all[..., None] == s_ar  # [C, L, S]
    first_all = jnp.min(
        jnp.where(oh_all, li[None, :, None], L - 1), axis=1)  # [C, S]
    seg_row_all = jnp.take_along_axis(row_c, first_all, axis=1)
    seg_rst_all = jnp.take_along_axis(rst_c, first_all, axis=1)
    sel = ((seg_row_all[..., None] == r_ar)
           & ~seg_rst_all[..., None])  # [C, S, R]
    prev_all = jnp.einsum("csr,rhpn->cshpn",
                          sel.astype(jnp.float32), init_ssm)

    def chunk_fn(S_run, inp):
        dxc, Bc, Cc, ld, seg, row, rst, ist, rl, prev_in = inp
        cum = jnp.cumsum(ld, axis=0)  # [L, nh] inclusive
        start_local = (li == 0) | (seg != jnp.concatenate(
            [seg[:1], seg[:-1]]))
        sidx = jax.lax.cummax(jnp.where(start_local, li, 0))
        base = jnp.where((sidx > 0)[:, None],
                         cum[jnp.clip(sidx - 1, 0, L - 1)], 0.0)
        inter_decay = jnp.exp(cum - base)  # [L, nh]
        # Does the first token continue a segment from the previous
        # chunk (the "run")? If so its carry is S_run, not the buffer.
        continues = ~ist[0]

        CB = jnp.einsum("ihn,jhn->hij", Cc, Bc,
                        preferred_element_type=jnp.float32)
        decay = jnp.exp(
            jnp.minimum(cum[:, None, :] - cum[None, :, :], 0.0))
        mask = (seg[:, None] == seg[None, :]) & (li[:, None]
                                                 >= li[None, :])
        W = decay.transpose(2, 0, 1) * mask[None]  # [nh, L, L] f32
        y_intra = jnp.einsum("hij,jhp->ihp", (CB * W).astype(cd), dxc,
                             preferred_element_type=jnp.float32)

        sl = jnp.clip(seg - seg[0], 0, S_MAX - 1)  # [L] local slot
        oh = sl[:, None] == s_ar[None, :]  # [L, S]
        first = jnp.min(jnp.where(oh, li[:, None], L - 1), axis=0)
        last = jnp.max(jnp.where(oh, li[:, None], 0), axis=0)
        seg_row = row[first]  # [S_MAX]
        prev_s = jnp.where(
            ((s_ar == 0) & continues)[:, None, None, None],
            S_run[None], prev_in)  # [S, nh, p, n]
        # y_inter: C_l . prev(segment of l), scaled by the decay from
        # the token's in-chunk segment entry.
        segC = jnp.einsum("lhn,shpn->slhp", Cc, prev_s.astype(cd),
                          preferred_element_type=jnp.float32)
        y_inter = jnp.take_along_axis(
            segC, sl[None, :, None, None], axis=0)[0]
        y_inter = y_inter * inter_decay[..., None]
        # Per-segment end state: decay the entry state to the
        # segment's last token and add the in-chunk outer-product sum
        # with per-token end weights.
        cum_last = cum[last]  # [S, nh]
        u = jnp.exp(jnp.minimum(cum_last[sl] - cum, 0.0))
        onehot = oh.astype(cd)
        S_add = jnp.einsum("ls,lhp,lhn->shpn", onehot,
                           (dxc * u[..., None]).astype(cd), Bc,
                           preferred_element_type=jnp.float32)
        S_new = prev_s * inter_decay[last][..., None, None] + S_add
        n_seg = seg[-1] - seg[0]  # (count - 1)
        # Emit a candidate only where the segment reaches its row's
        # true stream end — mid-run emissions would shadow the final
        # value.
        ends = rl[last]  # [S_MAX] row-last reached in this chunk
        cand_rows = jnp.where((s_ar <= n_seg) & (seg_row < R) & ends,
                              seg_row, R)
        new_run = S_new[jnp.clip(n_seg, 0, S_MAX - 1)]
        return new_run, (cand_rows, S_new, y_intra + y_inter)

    run0 = jnp.zeros(init_ssm.shape[1:], jnp.float32)
    _, (cand_rows, cand_states, ys) = jax.lax.scan(
        chunk_fn, run0,
        (resh(dx.astype(cd)), resh(B_h.astype(cd)),
         resh(C_h.astype(cd)), resh(logdA), resh(seg_id),
         resh(row_of), resh(fresh_here), resh(is_start),
         resh(is_last), prev_all))

    # Assemble final per-row states: each row's segment ends in
    # exactly one chunk and was emitted there as a (row, state)
    # candidate; rows with no candidate keep their step-entry state.
    Kc = cand_rows.shape[0] * S_MAX
    rows_flat = cand_rows.reshape(Kc)
    states_flat = cand_states.reshape((Kc, ) + init_ssm.shape[1:])
    match = rows_flat[None, :] == r_ar[:, None]  # [R, Kc]
    found = jnp.any(match, axis=1)
    last_k = Kc - 1 - jnp.argmax(match[:, ::-1], axis=1)
    sel_last = match & (jnp.arange(Kc)[None, :] == last_k[:, None])
    # One-hot contraction instead of a row gather (see prev_all note).
    gathered = jnp.einsum("rk,khpn->rhpn", sel_last.astype(jnp.float32),
                          states_flat)
    ssm_final = jnp.where(found[:, None, None, None], gathered,
                          init_ssm)

    y = ys.reshape(T, nh, p) + layer["D"].astype(
        jnp.float32)[:, None] * x_h
    return y.reshape(T, d_inner), MambaState(conv=new_conv,
                                             ssm=ssm_final)


def _out(cfg, layer, y, gate, eps):
    y = _gated_rms_norm(y, gate, layer["mixer_norm"], eps)
    return linear(layer["out_proj"], y)


# ---------------------------------------------------------------------------
# Mamba1 (selective scan) — ref analog: vllm/model_executor/layers/
# mamba/mamba_mixer.py + csrc selective_scan_fwd / causal_conv1d and
# the v1 backend vllm/v1/attention/backends/mamba1_attn.py.
#
# Differences from mamba2/SSD: A is a full [d_inner, N] matrix (decay
# per channel-state, not per head), dt comes from a low-rank
# projection of the post-conv stream (x_proj -> dt_rank -> dt_proj),
# and the output gate is a plain silu multiply (no gated RMSNorm).
# Because the decay is per (channel, state), the SSD chunk-matmul
# trick doesn't apply; the TPU-native prefill is a Blelloch-style
# ``jax.lax.associative_scan`` over the linear recurrence
# h_t = a_t * h_{t-1} + b_t — O(log T) depth, fully parallel on the
# VPU, where the reference runs a sequential CUDA scan. Ragged
# streams fold in by zeroing ``a`` at segment starts and injecting
# the carried per-row state into ``b`` there.
#
# Layer leaf schema (mamba1 mixer):
#     in_proj:  {"weight": [E, 2*d_inner]}
#     conv_w:   [K, d_inner]          conv_b: [d_inner] (optional)
#     x_proj:   {"weight": [d_inner, dt_rank + 2N]}
#     dt_proj:  {"weight": [dt_rank, d_inner], "bias": [d_inner]}
#     A_log:    [d_inner, N]          D: [d_inner]
#     out_proj: {"weight": [d_inner, E]}
# ---------------------------------------------------------------------------


def make_mamba1_state(max_num_reqs: int, cfg: ModelConfig,
                      dtype) -> MambaState:
    d_inner = cfg.mamba_d_inner
    return MambaState(
        conv=jnp.zeros((max_num_reqs, cfg.mamba_d_conv - 1, d_inner),
                       dtype),
        ssm=jnp.zeros((max_num_reqs, d_inner, cfg.mamba_d_state),
                      jnp.float32),
    )


def _m1_ssm_inputs(cfg: ModelConfig, layer: dict, u: jax.Array):
    """Post-conv stream -> (a, b, C) of the recurrence
    h = a * h_prev + b;  y = (h * C).sum(-1) + D * u."""
    N = cfg.mamba_d_state
    dtr = cfg.mamba_dt_rank
    xdbc = linear(layer["x_proj"], u.astype(jnp.float32))
    dt_r = xdbc[..., :dtr]
    B = xdbc[..., dtr:dtr + N]
    C = xdbc[..., dtr + N:]
    dt = jax.nn.softplus(linear(layer["dt_proj"], dt_r))  # [.., d_inner]
    A = -jnp.exp(layer["A_log"].astype(jnp.float32))  # [d_inner, N]
    a = jnp.exp(dt[..., None] * A)  # [.., d_inner, N]
    b = (dt * u)[..., None] * B[..., None, :]
    return a, b, C


def mamba1_mixer(
    cfg: ModelConfig,
    layer: dict,
    x: jax.Array,  # [T, E]
    positions: jax.Array,  # [T]
    state: MambaState,
    row_of: jax.Array,  # [T]
    decode_rows: bool,
) -> tuple[jax.Array, MambaState]:
    d_inner = cfg.mamba_d_inner
    K = cfg.mamba_d_conv
    proj = linear(layer["in_proj"], x)  # [T, 2*d_inner]
    xs = proj[..., :d_inner]
    gate = proj[..., d_inner:]
    conv_w = layer["conv_w"].astype(jnp.float32)  # [K, d_inner]
    conv_b = layer.get("conv_b")
    R = state.conv.shape[0]
    D = layer["D"].astype(jnp.float32)

    if decode_rows:
        reset = positions == 0
        conv_prev = jnp.where(reset[:, None, None], 0.0,
                              state.conv.astype(jnp.float32))
        ssm_prev = jnp.where(reset[:, None, None], 0.0, state.ssm)
        window = jnp.concatenate(
            [conv_prev, xs.astype(jnp.float32)[:, None, :]], axis=1)
        conv_out = jnp.sum(window * conv_w[None], axis=1)
        if conv_b is not None:
            conv_out = conv_out + conv_b.astype(jnp.float32)
        u = jax.nn.silu(conv_out)
        a, b, C = _m1_ssm_inputs(cfg, layer, u)
        h = a * ssm_prev + b  # [R, d_inner, N]
        y = jnp.einsum("rdn,rn->rd", h, C) + D * u
        active = row_of < R
        new_state = MambaState(
            conv=jnp.where(active[:, None, None], window[:, 1:],
                           state.conv.astype(jnp.float32)).astype(
                               state.conv.dtype),
            ssm=jnp.where(active[:, None, None], h, state.ssm),
        )
        return _m1_out(layer, y, gate, x.dtype), new_state

    # Ragged prefill. Segment structure identical to the SSD path.
    T = x.shape[0]
    idx_t = jnp.arange(T, dtype=jnp.int32)
    safe_row = jnp.minimum(row_of, R - 1)
    prev_row = jnp.concatenate(
        [jnp.full((1, ), -1, row_of.dtype), row_of[:-1]])
    is_start = ((idx_t == 0) | (row_of != prev_row)
                | ((positions == 0) & (row_of < R)))
    seg_start = jax.lax.cummax(jnp.where(is_start, idx_t, 0))
    m = idx_t - seg_start
    reset_seg = positions[seg_start] == 0

    # Depthwise causal conv with per-row carry splicing (shared with
    # the SSD chunked path).
    xf = xs.astype(jnp.float32)
    conv_out, exts = ragged_causal_conv(
        xf, state.conv.astype(jnp.float32), conv_w, safe_row, m,
        reset_seg, positions)
    if conv_b is not None:
        conv_out = conv_out + conv_b.astype(jnp.float32)
    u = jax.nn.silu(conv_out)

    a, b, C = _m1_ssm_inputs(cfg, layer, u)  # [T, d, N] x2, [T, N]
    # Fold the ragged structure into the recurrence: the first token
    # of every segment cuts the chain (a' = 0) and, when the segment
    # continues a previous engine step, injects the carried row state
    # (b' = b + a * h_carry). After that, one associative scan
    # computes every h_t in parallel.
    carry = jnp.where(reset_seg[:, None, None], 0.0,
                      state.ssm[safe_row])  # [T, d, N]
    b = jnp.where(is_start[:, None, None], b + a * carry, b)
    a = jnp.where(is_start[:, None, None], 0.0, a)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=0)
    y = jnp.einsum("tdn,tn->td", h, C) + D * u

    # Final per-row state: h at each row's last token.
    next_row = jnp.concatenate(
        [row_of[1:], jnp.full((1, ), -1, row_of.dtype)])
    is_last = row_of != next_row
    r_ar = jnp.arange(R, dtype=jnp.int32)
    row_last = jnp.max(
        jnp.where((row_of[None, :] == r_ar[:, None]) & is_last[None, :],
                  idx_t[None, :], -1), axis=1)
    has_last = row_last >= 0
    ssm_new = jnp.where(has_last[:, None, None],
                        h[jnp.clip(row_last, 0, T - 1)], state.ssm)
    # New conv window per row (same gather-at-last as the SSD path).
    gidx = jnp.clip(row_last, 0, T - 1)
    conv_new = conv_windows_at_last(exts, gidx, has_last, state.conv)
    return (_m1_out(layer, y, gate, x.dtype),
            MambaState(conv=conv_new, ssm=ssm_new))


def _m1_out(layer, y, gate, dtype):
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    return linear(layer["out_proj"], y.astype(dtype))
