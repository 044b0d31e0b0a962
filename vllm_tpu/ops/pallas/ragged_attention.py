"""Pallas TPU kernel: ragged paged attention (unified prefill+decode).

The production attention path (XLA reference: ops/attention.py). Design
(SURVEY.md §7 "Pallas paged attention"):

- grid (R,): one program per request row, sequential on the core.
  Scalar-prefetched query_start_loc / seq_lens / block_tables drive
  manual DMA — no BlockSpec tiling, fully ragged.
- queries stream in QBLK-row windows (all heads at once; only the
  untiled token dim is sliced dynamically — Mosaic restriction: dynamic
  slices on tiled head/lane dims don't lower) from HBM.
- the KV-head loop is a *static* Python unroll (KH per-chip is small
  under TP); each head's G = H/KH query heads fold into matmul rows ->
  [QBLK*G, D] MXU tiles.
- KV streams block-table blocks F at a time into a double-buffered
  VMEM slot ([F*block_size, D] per K and V): the next superblock's DMAs
  overlap the current flash update, hiding HBM latency (decode is
  HBM-bound: each KV byte is read exactly once).
- online-softmax (flash) accumulation in fp32.

Ref analog: the role of vllm's triton_unified_attention.py + csrc paged
attention; the in-kernel dequant hook mirrors _cast_kv_tile
(triton_unified_attention.py:38) when quantized KV lands.

Output-write contract: each program DMAs full QBLK-row windows into
``out``; rows past a request's q_len spill into the *next* request's
rows, which that later program overwrites — grid execution is
sequential (dimension_semantics=("arbitrary",)). Rows past the last
request land in slack padding (caller allocates >= qsl[-1] + QBLK
rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.ops.kv_cache import LANE, QuantKV
from vllm_tpu.ops.pallas.fp8 import (E4M3_MAG_FIX, e4m3_quad_bf16,
                                     int8_to_f32, parity_token_map)

DEFAULT_QBLK = 128
DEFAULT_F = 4  # KV blocks fetched per flash iteration
NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    qsl_ref,  # [R+1] SMEM
    seq_lens_ref,  # [R] SMEM
    bt_ref,  # [R, max_blocks] SMEM
    off_ref,  # [1] SMEM: CP chunk offset (= cp rank; 0 off-CP)
    # inputs (HBM)
    q_hbm,  # [T_slack, H, Dp]
    kv_hbm,  # [num_blocks, 2*KH, bs, Dp]
    # outputs (HBM): out, or (out, lse) with return_lse
    *rest,
    sm_scale: float,
    block_size: int,
    QBLK: int,
    F: int,
    KH: int,
    G: int,
    max_blocks: int,
    sliding_window: int | None,
    logit_softcap: float | None,
    chunk_stride: int = 1,
    return_lse: bool = False,
    interpret: bool = False,
):
    if return_lse:
        (out_hbm, lse_hbm, q_buf, k_buf, v_buf, o_buf, lse_buf, q_sem,
         kv_sems, o_sem, lse_sem) = rest
    else:
        (out_hbm, q_buf, k_buf, v_buf, o_buf, q_sem, kv_sems,
         o_sem) = rest
        lse_hbm = lse_buf = lse_sem = None
    r = pl.program_id(0)
    q_start = qsl_ref[r]
    q_len = qsl_ref[r + 1] - q_start
    seq_len = seq_lens_ref[r]
    off = off_ref[0]
    FS = F * block_size
    D = q_buf.shape[-1]

    def kv_dma(slot, i, f, h):
        """K+V copies for block-table entry i*F+f, head h, into slot."""
        bidx = jnp.minimum(i * F + f, max_blocks - 1)
        bid = bt_ref[r, bidx]
        # Split-plane cache layout (K plane h, V plane KH + h): only
        # untiled leading dims are indexed; the copied tile [bs, Dp]
        # is fully aligned.
        k_cp = pltpu.make_async_copy(
            kv_hbm.at[bid, h],
            k_buf.at[slot, pl.ds(f * block_size, block_size), :],
            kv_sems.at[slot, 0, f])
        v_cp = pltpu.make_async_copy(
            kv_hbm.at[bid, KH + h],
            v_buf.at[slot, pl.ds(f * block_size, block_size), :],
            kv_sems.at[slot, 1, f])
        return k_cp, v_cp

    def kv_start(slot, i, h):
        for f in range(F):
            k_cp, v_cp = kv_dma(slot, i, f, h)
            k_cp.start()
            v_cp.start()

    def kv_wait(slot, i, h):
        for f in range(F):
            k_cp, v_cp = kv_dma(slot, i, f, h)
            k_cp.wait()
            v_cp.wait()

    @pl.when(q_len > 0)
    def _process():
        num_chunks = pl.cdiv(q_len, QBLK)

        def chunk_body(c, _):
            chunk_start = q_start + c * QBLK
            q_cp = pltpu.make_async_copy(
                q_hbm.at[pl.ds(chunk_start, QBLK)], q_buf, q_sem)
            q_cp.start()

            # KV range needed under causality: highest q position in
            # this chunk is seq_len - q_len + chunk_q_end - 1. Under CP
            # (chunk_stride > 1) local block slot i covers global chunk
            # i*stride + off, so only ceil((nblk - off)/stride) local
            # slots exist.
            chunk_q_end = jnp.minimum((c + 1) * QBLK, q_len)
            kv_hi = seq_len - q_len + chunk_q_end  # exclusive
            if chunk_stride == 1:
                num_iters = pl.cdiv(kv_hi, FS)
            else:
                nblk_g = pl.cdiv(kv_hi, block_size)
                nloc = pl.cdiv(jnp.maximum(nblk_g - off, 0),
                               chunk_stride)
                num_iters = pl.cdiv(nloc, F)

            # Row -> query position map (rows = q_local * G + g).
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (QBLK * G, 1), 0)
            q_local = row_ids // G
            q_pos = seq_len - q_len + c * QBLK + q_local  # [QG, 1]
            valid_row = q_local < (chunk_q_end - c * QBLK)

            q_cp.wait()

            lse_cols = []
            for h in range(KH):  # static unroll; KH/chip small under TP
                kv_start(0, 0, h)
                # Static head slice: [QBLK, G, D] -> [QBLK*G, D].
                q2 = q_buf[:, h * G:(h + 1) * G, :].reshape(QBLK * G, D)

                def flash_iter(i, carry, h=h):
                    m, l, acc = carry
                    slot = i % 2

                    @pl.when(i + 1 < num_iters)
                    def _():
                        kv_start((i + 1) % 2, i + 1, h)

                    kv_wait(slot, i, h)
                    # Cast KV up to the query dtype (fp8/int8 quantized
                    # caches dequantize here, in VMEM — the analog of
                    # the ref's in-kernel _cast_kv_tile). e4m3 decodes
                    # manually (ops/pallas/fp8.py: Mosaic's bulk fp8
                    # convert is pathologically slow).
                    fp8 = k_buf.dtype == jnp.float8_e4m3fn
                    if fp8:
                        # Quad-byte magnitude decode (fp8.py
                        # e4m3_quad_bf16): values * 2**-120 in
                        # [evens; odds] row order — the fix rides q2
                        # (scores) / p (output dot), operand-side.
                        k = e4m3_quad_bf16(
                            k_buf[slot], interpret).astype(q2.dtype)
                        v = e4m3_quad_bf16(
                            v_buf[slot], interpret).astype(q2.dtype)
                        q2d = q2 * jnp.asarray(E4M3_MAG_FIX, q2.dtype)
                    else:
                        k = k_buf[slot].astype(q2.dtype)  # [FS, D]
                        v = v_buf[slot].astype(q2.dtype)
                        q2d = q2
                    s = jax.lax.dot_general(
                        q2d, k, (((1, ), (1, )), ((), ())),
                        preferred_element_type=jnp.float32) * sm_scale
                    if logit_softcap is not None:
                        s = logit_softcap * jnp.tanh(s / logit_softcap)
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (1, FS), 1)  # [1, FS]
                    if fp8:
                        col = parity_token_map(col, FS // 2)
                    if chunk_stride == 1:
                        kv_pos = i * FS + col
                    else:
                        # global position of local slot (i*F + f).
                        f_idx = col // block_size
                        kv_pos = (((i * F + f_idx) * chunk_stride + off)
                                  * block_size + col % block_size)
                    mask = ((kv_pos <= q_pos) & (kv_pos < seq_len)
                            & valid_row)
                    if sliding_window is not None:
                        mask &= kv_pos > q_pos - sliding_window
                    s = jnp.where(mask, s, NEG_INF)

                    m_new = jnp.maximum(m, jnp.max(s, axis=1,
                                                   keepdims=True))
                    p = jnp.exp(s - m_new)
                    p = jnp.where(mask, p, 0.0)
                    alpha = jnp.exp(m - m_new)
                    l_new = alpha * l + jnp.sum(p, axis=1, keepdims=True)
                    if fp8:
                        p = p * E4M3_MAG_FIX  # V-side rebias
                    acc_new = alpha * acc + jax.lax.dot_general(
                        p.astype(q2.dtype), v, (((1, ), (0, )), ((), ())),
                        preferred_element_type=jnp.float32)
                    return m_new, l_new, acc_new

                m0 = jnp.full((QBLK * G, 1), NEG_INF, jnp.float32)
                l0 = jnp.zeros((QBLK * G, 1), jnp.float32)
                acc0 = jnp.zeros((QBLK * G, D), jnp.float32)
                m, l, acc = jax.lax.fori_loop(0, num_iters, flash_iter,
                                              (m0, l0, acc0))
                out = acc / jnp.where(l == 0.0, 1.0, l)
                o_buf[:, h * G:(h + 1) * G, :] = out.reshape(
                    QBLK, G, D).astype(o_buf.dtype)
                if return_lse:
                    # lse = m + log(l); rows with no keys on this rank
                    # emit -inf (dropped by merge_attn_states; true
                    # -inf, matching the XLA reference's sentinel).
                    lse_cols.append(jnp.where(
                        l > 0.0, m + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                        -jnp.inf).reshape(QBLK, G))

            o_cp = pltpu.make_async_copy(
                o_buf, out_hbm.at[pl.ds(chunk_start, QBLK)], o_sem)
            o_cp.start()
            if return_lse:
                # [QBLK, H] lse, lane-padded to LANE for an aligned DMA.
                lse_all = jnp.concatenate(lse_cols, axis=1)
                H = KH * G
                lse_buf[...] = jnp.pad(lse_all, ((0, 0), (0, LANE - H)))
                l_cp = pltpu.make_async_copy(
                    lse_buf, lse_hbm.at[pl.ds(chunk_start, QBLK)],
                    lse_sem)
                l_cp.start()
                l_cp.wait()
            o_cp.wait()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _qkernel(
    # scalar prefetch
    qsl_ref,  # [R+1] SMEM
    seq_lens_ref,  # [R] SMEM
    bt_ref,  # [R, max_blocks] SMEM
    off_ref,  # [1] SMEM: CP chunk offset (= cp rank; 0 off-CP)
    # inputs (HBM)
    q_hbm,  # [T_slack, H, Dp]
    kv_hbm,  # [num_blocks, 2*KH, bs, Dp] int8/fp8
    sc_hbm,  # [num_blocks, SP2, LANE] f32
    # outputs (HBM) + scratch via *rest (return_lse adds lse slots)
    *rest,
    sm_scale: float,
    block_size: int,
    QBLK: int,
    F: int,
    KH: int,
    G: int,
    max_blocks: int,
    sliding_window: int | None,
    logit_softcap: float | None,
    packed: bool = False,
    levels: tuple | None = None,
    chunk_stride: int = 1,
    return_lse: bool = False,
    interpret: bool = False,
):
    """Per-token-head quantized variant: K-scales multiply score
    columns, V-scales multiply prob columns, so the flash update runs
    per KV block (scale rows are lane-resident per block — no
    transposes). Ref analog: unified_attention_int4
    (v1/attention/ops/int4_per_token_head.py).

    packed=True: nibble caches [B, KH, bs, Dp] uint8, K low / V high
    nibble (kv_cache.py); one byte-plane DMA per (block, head) rides in
    k_buf (v_buf unused), q arrives RHT-rotated and the caller
    un-rotates the output."""
    if return_lse:
        (out_hbm, lse_hbm, q_buf, k_buf, v_buf, s_buf, o_buf, lse_buf,
         q_sem, kv_sems, o_sem, lse_sem) = rest
    else:
        (out_hbm, q_buf, k_buf, v_buf, s_buf, o_buf, q_sem, kv_sems,
         o_sem) = rest
        lse_hbm = lse_buf = lse_sem = None
    r = pl.program_id(0)
    q_start = qsl_ref[r]
    q_len = qsl_ref[r + 1] - q_start
    seq_len = seq_lens_ref[r]
    off = off_ref[0]
    FS = F * block_size
    D = q_buf.shape[-1]
    int8 = k_buf.dtype == jnp.int8 and not packed

    def _lut(idx):
        from vllm_tpu.ops.kv_cache import codebook_select
        return codebook_select(idx, levels)

    def kv_dma(slot, i, f, h):
        bidx = jnp.minimum(i * F + f, max_blocks - 1)
        bid = bt_ref[r, bidx]
        s_cp = pltpu.make_async_copy(
            sc_hbm.at[bid], s_buf.at[slot, f],
            kv_sems.at[slot, 2, f])
        if packed:
            kv_cp = pltpu.make_async_copy(
                kv_hbm.at[bid, h],
                k_buf.at[slot, pl.ds(f * block_size, block_size), :],
                kv_sems.at[slot, 0, f])
            return kv_cp, s_cp
        k_cp = pltpu.make_async_copy(
            kv_hbm.at[bid, h],
            k_buf.at[slot, pl.ds(f * block_size, block_size), :],
            kv_sems.at[slot, 0, f])
        v_cp = pltpu.make_async_copy(
            kv_hbm.at[bid, KH + h],
            v_buf.at[slot, pl.ds(f * block_size, block_size), :],
            kv_sems.at[slot, 1, f])
        return k_cp, v_cp, s_cp

    def kv_start(slot, i, h):
        for f in range(F):
            for cp in kv_dma(slot, i, f, h):
                cp.start()

    def kv_wait(slot, i, h):
        for f in range(F):
            for cp in kv_dma(slot, i, f, h):
                cp.wait()

    @pl.when(q_len > 0)
    def _process():
        num_chunks = pl.cdiv(q_len, QBLK)

        def chunk_body(c, _):
            chunk_start = q_start + c * QBLK
            q_cp = pltpu.make_async_copy(
                q_hbm.at[pl.ds(chunk_start, QBLK)], q_buf, q_sem)
            q_cp.start()

            chunk_q_end = jnp.minimum((c + 1) * QBLK, q_len)
            kv_hi = seq_len - q_len + chunk_q_end  # exclusive
            if chunk_stride == 1:
                num_iters = pl.cdiv(kv_hi, FS)
            else:
                nblk_g = pl.cdiv(kv_hi, block_size)
                nloc = pl.cdiv(jnp.maximum(nblk_g - off, 0),
                               chunk_stride)
                num_iters = pl.cdiv(nloc, F)

            row_ids = jax.lax.broadcasted_iota(jnp.int32, (QBLK * G, 1), 0)
            q_local = row_ids // G
            q_pos = seq_len - q_len + c * QBLK + q_local  # [QG, 1]
            valid_row = q_local < (chunk_q_end - c * QBLK)

            q_cp.wait()

            lse_cols = []
            for h in range(KH):
                kv_start(0, 0, h)
                q2 = q_buf[:, h * G:(h + 1) * G, :].reshape(QBLK * G, D)

                def flash_iter(i, carry, h=h):
                    slot = i % 2

                    @pl.when(i + 1 < num_iters)
                    def _():
                        kv_start((i + 1) % 2, i + 1, h)

                    kv_wait(slot, i, h)
                    m, l, acc = carry
                    # Per-block flash: each block's lane-resident scale
                    # rows dequantize scores/probs.
                    for f in range(F):
                        blk = pl.ds(f * block_size, block_size)
                        if packed:
                            byte = k_buf[slot, blk, :].astype(jnp.int32)
                            k_i = byte & 0xF
                            v_i = byte >> 4
                            if levels is not None:
                                k = _lut(k_i).astype(q2.dtype)
                                v = _lut(v_i).astype(q2.dtype)
                            else:
                                k = (k_i - 8).astype(jnp.float32).astype(
                                    q2.dtype)
                                v = (v_i - 8).astype(jnp.float32).astype(
                                    q2.dtype)
                        elif int8:
                            k = int8_to_f32(
                                k_buf[slot, blk, :]).astype(q2.dtype)
                            v = int8_to_f32(
                                v_buf[slot, blk, :]).astype(q2.dtype)
                        else:
                            # quad-byte magnitude decode (fp8.py
                            # e4m3_quad_bf16): values * 2**-120 in
                            # [evens; odds] row order; scale lanes are
                            # stored parity-split to match
                            # (kv_cache.parity_scale_lane), and the
                            # 2**120 rides q2 / s_v operand-side.
                            k = e4m3_quad_bf16(
                                k_buf[slot, blk, :],
                                interpret).astype(q2.dtype)
                            v = e4m3_quad_bf16(
                                v_buf[slot, blk, :],
                                interpret).astype(q2.dtype)
                        fp8 = not packed and not int8
                        lane0 = h * block_size
                        s_k = s_buf[slot, f, 0:1,
                                    lane0:lane0 + block_size]
                        s_v = s_buf[slot, f, 1:2,
                                    lane0:lane0 + block_size]
                        q2d = (q2 * jnp.asarray(E4M3_MAG_FIX, q2.dtype)
                               if fp8 else q2)
                        if fp8:
                            s_v = s_v * E4M3_MAG_FIX
                        s = jax.lax.dot_general(
                            q2d, k, (((1, ), (1, )), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s * s_k * sm_scale
                        if logit_softcap is not None:
                            s = logit_softcap * jnp.tanh(s / logit_softcap)
                        within = jax.lax.broadcasted_iota(
                            jnp.int32, (1, block_size), 1)
                        if fp8:
                            within = parity_token_map(
                                within, block_size // 2)
                        if chunk_stride == 1:
                            kv_pos = i * FS + f * block_size + within
                        else:
                            kv_pos = (((i * F + f) * chunk_stride + off)
                                      * block_size + within)
                        mask = ((kv_pos <= q_pos) & (kv_pos < seq_len)
                                & valid_row)
                        if sliding_window is not None:
                            mask &= kv_pos > q_pos - sliding_window
                        s = jnp.where(mask, s, NEG_INF)

                        m_new = jnp.maximum(
                            m, jnp.max(s, axis=1, keepdims=True))
                        p = jnp.exp(s - m_new)
                        p = jnp.where(mask, p, 0.0)
                        alpha = jnp.exp(m - m_new)
                        l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
                        acc = alpha * acc + jax.lax.dot_general(
                            (p * s_v).astype(q2.dtype), v,
                            (((1, ), (0, )), ((), ())),
                            preferred_element_type=jnp.float32)
                        m = m_new
                    return m, l, acc

                m0 = jnp.full((QBLK * G, 1), NEG_INF, jnp.float32)
                l0 = jnp.zeros((QBLK * G, 1), jnp.float32)
                acc0 = jnp.zeros((QBLK * G, D), jnp.float32)
                m, l, acc = jax.lax.fori_loop(0, num_iters, flash_iter,
                                              (m0, l0, acc0))
                out = acc / jnp.where(l == 0.0, 1.0, l)
                o_buf[:, h * G:(h + 1) * G, :] = out.reshape(
                    QBLK, G, D).astype(o_buf.dtype)
                if return_lse:
                    # lse = m + log(l); rows with no keys on this rank
                    # emit -inf (dropped by merge_attn_states; true
                    # -inf, matching the XLA reference's sentinel).
                    lse_cols.append(jnp.where(
                        l > 0.0, m + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                        -jnp.inf).reshape(QBLK, G))

            o_cp = pltpu.make_async_copy(
                o_buf, out_hbm.at[pl.ds(chunk_start, QBLK)], o_sem)
            o_cp.start()
            if return_lse:
                lse_all = jnp.concatenate(lse_cols, axis=1)
                H = KH * G
                lse_buf[...] = jnp.pad(lse_all, ((0, 0), (0, LANE - H)))
                l_cp = pltpu.make_async_copy(
                    lse_buf, lse_hbm.at[pl.ds(chunk_start, QBLK)],
                    lse_sem)
                l_cp.start()
                l_cp.wait()
            o_cp.wait()
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "q_blk", "f_blocks", "causal",
                     "sliding_window", "logit_softcap", "interpret",
                     "has_slack", "chunk_stride", "return_lse"))
def ragged_paged_attention(
    q: jax.Array,  # [T(_slack), H, D]
    kv_cache: jax.Array,  # [num_blocks, 2*KH, bs, Dp]
    block_tables: jax.Array,  # [R, max_blocks] i32
    query_start_loc: jax.Array,  # [R+1] i32
    seq_lens: jax.Array,  # [R] i32
    *,
    sm_scale: float,
    q_blk: int = DEFAULT_QBLK,
    f_blocks: int = DEFAULT_F,
    causal: bool = True,  # noqa: ARG001 — always causal; kept for API parity
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    interpret: bool = False,
    has_slack: bool = False,
    # Context parallelism (parallel/context.py): local block-table
    # slot i covers global token chunk i*chunk_stride + chunk_offset;
    # return_lse adds an [T, H] f32 log-sum-exp output for
    # merge_attn_states. Ref analog: dcp_alltoall.py's partials.
    chunk_stride: int = 1,
    chunk_offset: jax.Array | int = 0,
    return_lse: bool = False,
):
    T, H, D = q.shape
    T_in = T
    R, max_blocks = block_tables.shape
    quant = isinstance(kv_cache, QuantKV)
    data = kv_cache.data if quant else kv_cache
    packed = quant and data.dtype == jnp.uint8
    num_blocks, planes, block_size, Dp = data.shape
    KH = planes if packed else planes // 2
    G = H // KH
    F = f_blocks
    QBLK = q_blk
    pad_d = Dp - D if D < Dp else 0
    # Window-DMA slack: programs copy whole QBLK-row windows, so the
    # buffer needs q_blk rows past qsl[-1]. Callers that already
    # allocate the slack (the runner) pass has_slack=True to skip the
    # pad copy.
    pad_t = 0 if has_slack else QBLK
    if pad_d or pad_t:
        q = jnp.pad(q, [(0, pad_t), (0, 0), (0, pad_d)])
    T = q.shape[0]
    off_arr = jnp.asarray(chunk_offset, jnp.int32).reshape(1)
    assert H <= LANE, "lse lane-padding assumes H <= 128"

    def shape_outs(dtype):
        if not return_lse:
            return jax.ShapeDtypeStruct((T, H, Dp), dtype)
        return (jax.ShapeDtypeStruct((T, H, Dp), dtype),
                jax.ShapeDtypeStruct((T, LANE), jnp.float32))

    def out_specs():
        if not return_lse:
            return pl.BlockSpec(memory_space=pltpu.HBM)
        return (pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM))

    if quant:
        out_dtype = q.dtype
        levels = None
        if packed:
            # RHT nibble modes: run in the rotated basis (see the
            # decode kernel) — rotate q, un-rotate the output.
            from vllm_tpu.ops.kv_cache import (TQ3_LEVELS, TQ4_LEVELS,
                                               _rht_matrix)
            if kv_cache.codebook is not None:
                levels = (TQ4_LEVELS if kv_cache.codebook.shape[0] == 16
                          else TQ3_LEVELS)
            rot = _rht_matrix(Dp)
            q = q.astype(jnp.float32) @ rot
        SUB, SL = kv_cache.scales.shape[1:3]
        scratch = [
            pltpu.VMEM((QBLK, H, Dp), q.dtype),
            pltpu.VMEM((2, F * block_size, Dp), data.dtype),
            pltpu.VMEM((2, F * block_size, Dp), data.dtype),
            pltpu.VMEM((2, F, SUB, SL), jnp.float32),
            pltpu.VMEM((QBLK, H, Dp), q.dtype),
        ]
        if return_lse:
            scratch.append(pltpu.VMEM((QBLK, LANE), jnp.float32))
        scratch += [
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 3, F)),
            pltpu.SemaphoreType.DMA(()),
        ]
        if return_lse:
            scratch.append(pltpu.SemaphoreType.DMA(()))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(R, ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # q
                pl.BlockSpec(memory_space=pltpu.HBM),  # kv data
                pl.BlockSpec(memory_space=pltpu.HBM),  # kv scales
            ],
            out_specs=out_specs(),
            scratch_shapes=scratch,
        )
        kernel = functools.partial(
            _qkernel, sm_scale=sm_scale, block_size=block_size,
            QBLK=QBLK, F=F, KH=KH, G=G, max_blocks=max_blocks,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            packed=packed, levels=levels, chunk_stride=chunk_stride,
            return_lse=return_lse, interpret=interpret)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=shape_outs(q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", ), ),
            cost_estimate=pl.CostEstimate(
                flops=4 * T * H * D * 1024,
                bytes_accessed=int(data.size * data.dtype.itemsize),
                transcendentals=T * H * 1024,
            ),
            interpret=interpret,
        )(query_start_loc, seq_lens, block_tables, off_arr, q, data,
          kv_cache.scales)
        if return_lse:
            out, lse = out
        if packed:
            out = (out @ rot.T).astype(out_dtype)
        if return_lse:
            return out[:T_in, :, :D], lse[:T_in, :H]
        return out[:T_in, :, :D]

    scratch = [
        pltpu.VMEM((QBLK, H, Dp), q.dtype),
        pltpu.VMEM((2, F * block_size, Dp), kv_cache.dtype),
        pltpu.VMEM((2, F * block_size, Dp), kv_cache.dtype),
        pltpu.VMEM((QBLK, H, Dp), q.dtype),
    ]
    if return_lse:
        scratch.append(pltpu.VMEM((QBLK, LANE), jnp.float32))
    scratch += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2, 2, F)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if return_lse:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(R, ),
        in_specs=[
            # Pin to HBM: under ANY the compiler hoists small arrays
            # into VMEM, where tile-padded sliced DMAs fail to lower.
            pl.BlockSpec(memory_space=pltpu.HBM),  # q
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv
        ],
        out_specs=out_specs(),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel,
        sm_scale=sm_scale,
        block_size=block_size,
        QBLK=QBLK,
        F=F,
        KH=KH,
        G=G,
        max_blocks=max_blocks,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        chunk_stride=chunk_stride,
        return_lse=return_lse,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=shape_outs(q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * H * D * 1024,
            bytes_accessed=int(kv_cache.size * kv_cache.dtype.itemsize),
            transcendentals=T * H * 1024,
        ),
        interpret=interpret,
    )(query_start_loc, seq_lens, block_tables, off_arr, q, kv_cache)
    if return_lse:
        out, lse = out
        return out[:T_in, :, :D], lse[:T_in, :H]
    return out[:T_in, :, :D]
