"""Pallas TPU kernel: decode-specialized paged attention with fused
KV-cache write (1 query token per row).

Decode-specific redesigns over the ragged kernel
(ragged_attention.py):

1. **Whole-block DMAs + deep ring.** Decode is DMA-latency-bound; one
   copy per KV block brings a whole head-group slice ([2*HG, bs, Dp]
   contiguous in the head-major layout) through a 4-deep ring of
   in-flight copies. q/out ride BlockSpecs (pallas pipelines them
   across the grid).
2. **Fused KV write-through.** The cache rides through
   ``input_output_aliases`` (true in-place); each program *injects* its
   new K/V row into the streamed VMEM tile of the row's current block
   (mask select — no dynamic sublane indexing) and DMAs the modified
   K/V tiles back. This removes the separate XLA scatter, whose
   output-feeds-custom-call pattern forced a full cache copy per layer
   (~4ms/iter at 1.1B).
3. **Head-group grid dimension.** The grid is (R, KH // HG): each
   program owns HG kv heads (a *static* unroll bounded at HG <= 8), so
   MHA models (KH = 32, e.g. Llama-2-7B) compile — the old whole-KH
   unroll blew up Mosaic code size. Programs touching the same block
   write disjoint head slices, so the fused write stays race-free.

Decode causality is free: the single query sits at seq_len-1, so the
only mask is kv_pos < seq_len (which includes the just-written token).

Used by the multi-step decode loop via ops/dispatch.py (q_blk == 1).
Ref analog: reshape_and_cache + paged attention fused, the decode half
of triton_unified_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.ops.kv_cache import (LANE, QuantKV, quant_max,
                                   scale_planes)

RING = 4  # in-flight KV-block DMAs per program
MAX_HG = 8  # max kv heads statically unrolled per program


def _pick_head_group(KH: int, aligned: bool = False) -> int:
    """Largest divisor of KH that is <= MAX_HG.

    aligned=True (quantized KV): when splitting into several head
    groups, the per-group scale-plane DMA slice is 2*HG sublanes, which
    Mosaic requires to be a multiple of 8 — so accept only HG % 4 == 0
    (or the no-split HG == KH case, which DMAs the whole padded plane).
    """
    for hg in range(min(KH, MAX_HG), 0, -1):
        if KH % hg == 0 and (not aligned or hg == KH or hg % 4 == 0):
            return hg
    return 1


def _kernel(
    # scalar prefetch
    seq_lens_ref,  # [R] SMEM
    bt_ref,  # [R, max_blocks] SMEM
    # inputs
    q_ref,  # [1, HG*G, Dp] VMEM block (this row's query, this group)
    new_kv_ref,  # [1, 2*HG, Dp] VMEM block (new K/V rows, this group)
    kv_hbm,  # [num_blocks, 2*KH, bs, Dp] HBM (aliased to output)
    # outputs
    o_ref,  # [1, HG*G, Dp] VMEM block
    kv_out,  # aliased kv_hbm
    # scratch
    kv_buf,  # [RING, 2*HG, bs, Dp] VMEM
    sems,  # DMA sems [RING]
    wsem,  # write-back sem
    *,
    sm_scale: float,
    block_size: int,
    HG: int,
    G: int,
    max_blocks: int,
    sliding_window: int | None,
    logit_softcap: float | None,
):
    r = pl.program_id(0)
    hg = pl.program_id(1)
    head0 = hg * 2 * HG  # first kv-plane slot of this head group
    seq_len = seq_lens_ref[r]
    nblk = pl.cdiv(seq_len, block_size)
    # Sliding window: blocks fully below the window are skipped.
    first_blk = (jnp.maximum(seq_len - sliding_window, 0) // block_size
                 if sliding_window is not None else 0)
    last_blk = jnp.maximum(nblk - 1, 0)
    off = (seq_len - 1) % block_size
    D = q_ref.shape[-1]

    def dma(slot, i):
        bidx = jnp.minimum(i, max_blocks - 1)
        return pltpu.make_async_copy(
            kv_hbm.at[bt_ref[r, bidx], pl.ds(head0, 2 * HG)],
            kv_buf.at[slot], sems.at[slot])

    @pl.when(seq_len > 0)
    def _():
        # Prime the ring; slot = absolute block index mod RING so the
        # body (which starts at first_blk) waits on matching slots.
        for p in range(RING):
            @pl.when(first_blk + p < nblk)
            def _(p=p):
                dma((first_blk + p) % RING, first_blk + p).start()

        row_sel = (jax.lax.broadcasted_iota(jnp.int32,
                                            (block_size, 1), 0) == off)

        def body(i, carry):
            slot = i % RING
            dma(slot, i).wait()

            # Inject this row's new K/V into its current block's tile
            # (mask select over the sublane dim) and write it back.
            @pl.when(i == last_blk)
            def _():
                for hs in range(2 * HG):
                    tile = kv_buf[slot, hs]  # [bs, Dp]
                    new_row = new_kv_ref[0, hs, :][None, :]
                    kv_buf[slot, hs] = jnp.where(row_sel, new_row, tile)
                wb = pltpu.make_async_copy(
                    kv_buf.at[slot],
                    kv_out.at[bt_ref[r, last_blk], pl.ds(head0, 2 * HG)],
                    wsem)
                wb.start()
                wb.wait()

            kv_pos = i * block_size + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_size), 1)
            mask = kv_pos < seq_len  # [1, bs]
            if sliding_window is not None:
                # decode query position is seq_len - 1
                mask &= kv_pos > seq_len - 1 - sliding_window
            new_carry = []
            for h in range(HG):
                m, l, acc = carry[h]
                q_h = q_ref[0, h * G:(h + 1) * G, :]  # [G, Dp]
                # Upcast quantized (fp8) caches at the VMEM boundary
                # (ref analog: _cast_kv_tile in-kernel dequant).
                k = kv_buf[slot, 2 * h].astype(q_h.dtype)  # [bs, Dp]
                v = kv_buf[slot, 2 * h + 1].astype(q_h.dtype)
                s = jax.lax.dot_general(
                    q_h, k, (((1, ), (1, )), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                if logit_softcap is not None:
                    s = logit_softcap * jnp.tanh(s / logit_softcap)
                s = jnp.where(mask, s, -1e30)
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                p_ = jnp.exp(s - m_new)
                p_ = jnp.where(mask, p_, 0.0)
                alpha = jnp.exp(m - m_new)
                l_new = alpha * l + jnp.sum(p_, axis=1, keepdims=True)
                acc_new = alpha * acc + jax.lax.dot_general(
                    p_.astype(q_h.dtype), v.astype(q_h.dtype),
                    (((1, ), (0, )), ((), ())),
                    preferred_element_type=jnp.float32)
                new_carry.append((m_new, l_new, acc_new))

            @pl.when(i + RING < nblk)
            def _():
                dma(slot, i + RING).start()

            return tuple(new_carry)

        init = tuple(
            (jnp.full((G, 1), -1e30, jnp.float32),
             jnp.zeros((G, 1), jnp.float32),
             jnp.zeros((G, D), jnp.float32)) for _ in range(HG))
        final = jax.lax.fori_loop(first_blk, nblk, body, init)
        for h in range(HG):
            m, l, acc = final[h]
            out = acc / jnp.where(l == 0.0, 1.0, l)
            o_ref[0, h * G:(h + 1) * G, :] = out.astype(o_ref.dtype)

    @pl.when(seq_len <= 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


def _qkernel(
    # scalar prefetch
    seq_lens_ref,  # [R] SMEM
    bt_ref,  # [R, max_blocks] SMEM
    # inputs
    q_ref,  # [1, HG*G, Dp] VMEM block
    new_kv_ref,  # [1, 2*HG, Dp] VMEM block (float, unquantized)
    kv_hbm,  # [num_blocks, 2*KH, bs, Dp] int8/fp8 (aliased)
    sc_hbm,  # [num_blocks, SP2, LANE] f32 (aliased)
    # outputs
    o_ref,  # [1, HG*G, Dp] VMEM block
    kv_out,  # aliased kv_hbm
    sc_out,  # aliased sc_hbm
    # scratch
    kv_buf,  # [RING, 2*HG, bs, Dp] quant dtype
    s_buf,  # [RING, SL, LANE] f32
    sems,  # DMA sems [RING, 2]
    wsem,  # write-back sems [2]
    *,
    sm_scale: float,
    block_size: int,
    HG: int,
    G: int,
    max_blocks: int,
    sliding_window: int | None,
    logit_softcap: float | None,
):
    """Per-token-head quantized variant of _kernel: K-scales multiply
    score columns, V-scales multiply prob columns (both lane-resident —
    zero relayouts); the fused write quantizes the new row in-kernel
    with the same round-half-up rule as ops/kv_cache.quantize_rows.
    Ref analog: int4_per_token_head.py store+attend pair."""
    r = pl.program_id(0)
    hg = pl.program_id(1)
    HG2 = 2 * HG
    SL = s_buf.shape[1]
    head0 = hg * HG2
    # Scale-plane slice start: when the group covers all heads the
    # whole padded plane rides along (SL >= 2*KH); else SL == 2*HG.
    s_head0 = hg * SL
    seq_len = seq_lens_ref[r]
    nblk = pl.cdiv(seq_len, block_size)
    first_blk = (jnp.maximum(seq_len - sliding_window, 0) // block_size
                 if sliding_window is not None else 0)
    last_blk = jnp.maximum(nblk - 1, 0)
    off = (seq_len - 1) % block_size
    D = q_ref.shape[-1]
    qdtype = kv_buf.dtype
    qmax = quant_max(qdtype)

    def dmas(slot, i):
        bidx = jnp.minimum(i, max_blocks - 1)
        bid = bt_ref[r, bidx]
        kv_cp = pltpu.make_async_copy(
            kv_hbm.at[bid, pl.ds(head0, HG2)], kv_buf.at[slot],
            sems.at[slot, 0])
        s_cp = pltpu.make_async_copy(
            sc_hbm.at[bid, pl.ds(s_head0, SL)], s_buf.at[slot],
            sems.at[slot, 1])
        return kv_cp, s_cp

    def start(slot, i):
        for cp in dmas(slot, i):
            cp.start()

    def wait(slot, i):
        for cp in dmas(slot, i):
            cp.wait()

    @pl.when(seq_len > 0)
    def _():
        for p in range(RING):
            @pl.when(first_blk + p < nblk)
            def _(p=p):
                start((first_blk + p) % RING, first_blk + p)

        row_sel = (jax.lax.broadcasted_iota(jnp.int32,
                                            (block_size, 1), 0) == off)
        col_sel = (jax.lax.broadcasted_iota(jnp.int32,
                                            (1, s_buf.shape[-1]), 1) == off)

        def body(i, carry):
            slot = i % RING
            wait(slot, i)

            # Quantize + inject this row's new K/V into the current
            # block's tiles (data + scale), write both back.
            @pl.when(i == last_blk)
            def _():
                for hs in range(HG2):
                    rowf = new_kv_ref[0, hs, :][None, :].astype(
                        jnp.float32)  # [1, Dp]
                    amax = jnp.max(jnp.abs(rowf), axis=1, keepdims=True)
                    scale = amax / qmax  # [1, 1]
                    inv = jnp.where(scale > 0.0, 1.0 / jnp.where(
                        scale > 0.0, scale, 1.0), 0.0)
                    scaled = rowf * inv
                    if qdtype == jnp.int8:
                        qrow = jnp.clip(jnp.floor(scaled + 0.5), -qmax,
                                        qmax).astype(jnp.int32).astype(
                                            jnp.int8)
                    else:
                        qrow = scaled.astype(qdtype)
                    tile = kv_buf[slot, hs]  # [bs, Dp]
                    kv_buf[slot, hs] = jnp.where(row_sel, qrow, tile)
                    srow = s_buf[slot, hs:hs + 1, :]  # [1, LANE]
                    s_buf[slot, hs:hs + 1, :] = jnp.where(
                        col_sel, scale, srow)
                bid = bt_ref[r, last_blk]
                wb = pltpu.make_async_copy(
                    kv_buf.at[slot], kv_out.at[bid, pl.ds(head0, HG2)],
                    wsem.at[0])
                sb = pltpu.make_async_copy(
                    s_buf.at[slot], sc_out.at[bid, pl.ds(s_head0, SL)],
                    wsem.at[1])
                wb.start()
                sb.start()
                wb.wait()
                sb.wait()

            kv_pos = i * block_size + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_size), 1)
            mask = kv_pos < seq_len  # [1, bs]
            if sliding_window is not None:
                mask &= kv_pos > seq_len - 1 - sliding_window
            new_carry = []
            for h in range(HG):
                m, l, acc = carry[h]
                q_h = q_ref[0, h * G:(h + 1) * G, :].astype(jnp.float32)
                if qdtype == jnp.int8:
                    k = kv_buf[slot, 2 * h].astype(jnp.int32).astype(
                        jnp.float32)
                    v = kv_buf[slot, 2 * h + 1].astype(jnp.int32).astype(
                        jnp.float32)
                else:
                    k = kv_buf[slot, 2 * h].astype(jnp.float32)
                    v = kv_buf[slot, 2 * h + 1].astype(jnp.float32)
                s_k = s_buf[slot, 2 * h:2 * h + 1, :block_size]  # [1,bs]
                s_v = s_buf[slot, 2 * h + 1:2 * h + 2, :block_size]
                s = jax.lax.dot_general(
                    q_h, k, (((1, ), (1, )), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * s_k * sm_scale  # dequant K on score columns
                if logit_softcap is not None:
                    s = logit_softcap * jnp.tanh(s / logit_softcap)
                s = jnp.where(mask, s, -1e30)
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                p_ = jnp.exp(s - m_new)
                p_ = jnp.where(mask, p_, 0.0)
                alpha = jnp.exp(m - m_new)
                l_new = alpha * l + jnp.sum(p_, axis=1, keepdims=True)
                acc_new = alpha * acc + jax.lax.dot_general(
                    p_ * s_v, v, (((1, ), (0, )), ((), ())),
                    preferred_element_type=jnp.float32)
                new_carry.append((m_new, l_new, acc_new))

            @pl.when(i + RING < nblk)
            def _():
                start(slot, i + RING)

            return tuple(new_carry)

        init = tuple(
            (jnp.full((G, 1), -1e30, jnp.float32),
             jnp.zeros((G, 1), jnp.float32),
             jnp.zeros((G, D), jnp.float32)) for _ in range(HG))
        final = jax.lax.fori_loop(first_blk, nblk, body, init)
        for h in range(HG):
            m, l, acc = final[h]
            out = acc / jnp.where(l == 0.0, 1.0, l)
            o_ref[0, h * G:(h + 1) * G, :] = out.astype(o_ref.dtype)

    @pl.when(seq_len <= 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "sliding_window",
                                    "logit_softcap", "interpret"))
def decode_paged_attention(
    q: jax.Array,  # [R, H, D]
    new_k: jax.Array,  # [R, KH, D] this step's K rows
    new_v: jax.Array,  # [R, KH, D]
    kv_cache: jax.Array,  # [num_blocks, 2*KH, bs, Dp] (donated)
    block_tables: jax.Array,  # [R, max_blocks]
    seq_lens: jax.Array,  # [R] length INCLUDING the new token
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (attn_out [R, H, D], updated kv_cache)."""
    R, H, D = q.shape
    quant = isinstance(kv_cache, QuantKV)
    data = kv_cache.data if quant else kv_cache
    num_blocks, kh2, block_size, Dp = data.shape
    KH = kh2 // 2
    G = H // KH
    HG = _pick_head_group(KH, aligned=quant)
    n_hg = KH // HG
    if D < Dp:
        pad = [(0, 0), (0, 0), (0, Dp - D)]
        q = jnp.pad(q, pad)
        new_k = jnp.pad(new_k, pad)
        new_v = jnp.pad(new_v, pad)
    # Interleave K/V rows on the head axis: [R, 2KH, Dp].
    new_kv = jnp.stack([new_k, new_v], axis=2).reshape(R, kh2, Dp)
    if quant:
        out, kv_cache = _decode_quant(
            q, new_kv, kv_cache, block_tables, seq_lens,
            sm_scale=sm_scale, HG=HG, n_hg=n_hg, G=G,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            interpret=interpret)
        return out[..., :D], kv_cache
    new_kv = new_kv.astype(kv_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R, n_hg),
        in_specs=[
            pl.BlockSpec((1, HG * G, Dp), lambda r, g, *_: (r, g, 0),
                         memory_space=pltpu.VMEM),  # q head-group
            pl.BlockSpec((1, 2 * HG, Dp), lambda r, g, *_: (r, g, 0),
                         memory_space=pltpu.VMEM),  # new kv head-group
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv cache
        ],
        out_specs=(
            pl.BlockSpec((1, HG * G, Dp), lambda r, g, *_: (r, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((RING, 2 * HG, block_size, Dp), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((RING, )),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, kv_cache = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale,
                          block_size=block_size, HG=HG, G=G,
                          max_blocks=block_tables.shape[1],
                          sliding_window=sliding_window,
                          logit_softcap=logit_softcap),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, H, Dp), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ),
        # args: (seq_lens, bt, q, new_kv, kv) -> kv is input 4,
        # aliased to output 1 (true in-place cache update).
        input_output_aliases={4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"), ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * D * 1024,
            bytes_accessed=int(kv_cache.size * kv_cache.dtype.itemsize),
            transcendentals=R * H * 1024,
        ),
        interpret=interpret,
    )(seq_lens, block_tables, q, new_kv, kv_cache)
    return out[..., :D], kv_cache


def _decode_quant(
    q: jax.Array,  # [R, H, Dp]
    new_kv: jax.Array,  # [R, 2KH, Dp] float (quantized in-kernel)
    kv_cache: QuantKV,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    *,
    sm_scale: float,
    HG: int,
    n_hg: int,
    G: int,
    sliding_window: int | None,
    logit_softcap: float | None,
    interpret: bool,
) -> tuple[jax.Array, QuantKV]:
    data, scales = kv_cache
    R, H, Dp = q.shape
    num_blocks, kh2, block_size, _ = data.shape
    D = Dp
    SP2 = scales.shape[1]
    SL = 2 * HG if n_hg > 1 else SP2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R, n_hg),
        in_specs=[
            pl.BlockSpec((1, HG * G, Dp), lambda r, g, *_: (r, g, 0),
                         memory_space=pltpu.VMEM),  # q head-group
            pl.BlockSpec((1, 2 * HG, Dp), lambda r, g, *_: (r, g, 0),
                         memory_space=pltpu.VMEM),  # new kv head-group
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv data
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv scales
        ],
        out_specs=(
            pl.BlockSpec((1, HG * G, Dp), lambda r, g, *_: (r, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((RING, 2 * HG, block_size, Dp), data.dtype),
            pltpu.VMEM((RING, SL, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((RING, 2)),
            pltpu.SemaphoreType.DMA((2, )),
        ],
    )
    out, data, scales = pl.pallas_call(
        functools.partial(_qkernel, sm_scale=sm_scale,
                          block_size=block_size, HG=HG, G=G,
                          max_blocks=block_tables.shape[1],
                          sliding_window=sliding_window,
                          logit_softcap=logit_softcap),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, H, Dp), q.dtype),
            jax.ShapeDtypeStruct(data.shape, data.dtype),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ),
        # args: (seq_lens, bt, q, new_kv, data, scales): data/scales
        # aliased to outputs 1/2 (true in-place cache update).
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"), ),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * H * D * 1024,
            bytes_accessed=int(data.size * data.dtype.itemsize),
            transcendentals=R * H * 1024,
        ),
        interpret=interpret,
    )(seq_lens, block_tables, q, new_kv, data, scales)
    return out, QuantKV(data, scales)
