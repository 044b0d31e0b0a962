"""Pallas TPU kernel: decode-specialized paged attention with fused
KV-cache write (1 query token per row).

Decode-specific redesigns over the ragged kernel
(ragged_attention.py):

1. **Row-batched programs + interleaved DMA rings.** Decode is
   DMA-latency-bound; each program owns RB request rows and issues
   their block copies through one interleaved ring, so the stream of
   in-flight copies never drains at row boundaries (measured 4.0 ->
   3.1 ms/step at 8B bs32 from this alone).
2. **Multi-block supersteps (F) + head-batched dots.** Each ring slot
   carries F=8 KV blocks, and ALL HG heads of a row fold into one
   [HG*G, Dp] x [Dp, HG*F*bs] score dot with a block-diagonal
   head-match mask (off-diagonal blocks are wasted MXU FLOPs — decode
   is DMA-bound, the MXU is idle) — decode flash math was
   small-dot-overhead-bound (4.0 -> 1.1 -> 0.045 ms/kernel at 8B
   bs32 across these restructures).
3. **Fused KV write-through.** The cache rides through
   ``input_output_aliases`` (true in-place); each program *injects* its
   new K/V row into the streamed VMEM tile of the row's current block
   (mask select — no dynamic sublane indexing) and DMAs the modified
   K/V tiles back. This removes the separate XLA scatter, whose
   output-feeds-custom-call pattern forced a full cache copy per layer
   (~4ms/iter at 1.1B).
4. **Head-group grid dimension.** The grid is (R/RB, KH // HG): each
   program owns HG kv heads (a *static* unroll bounded so MHA models
   (KH = 32, e.g. Llama-2-7B) compile — the old whole-KH unroll blew
   up Mosaic code size). Programs touching the same block write
   disjoint head slices, so the fused write stays race-free.

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

from vllm_tpu.ops.kv_cache import (TQ3_LEVELS, TQ4_LEVELS, QuantKV,
                                   _rht_matrix, codebook_select,
                                   is_packed_int4, parity_scale_lane,
                                   quant_max)
from vllm_tpu.ops.pallas.fp8 import (E4M3_MAG_FIX, e4m3_quad_bf16,
                                     int8_to_f32, parity_token_map)

RING = 4  # in-flight superstep slots per program
F_BLOCKS = 8  # KV blocks per superstep (bf16 kernel)
MAX_HG = 8  # max kv heads statically unrolled per program
MAX_UNROLL = 32  # bound on RB * HG (Mosaic code size)


def _pick_head_group(KH: int, block_size: int | None = None) -> int:
    """Largest divisor of KH that is <= MAX_HG. Quant modes pass
    ``block_size``: their scale-lane slices use *dynamic* offsets of
    head0 * block_size, which Mosaic only accepts when provably
    128-aligned, so HG * block_size must be a multiple of 128. Returns
    0 when no divisor satisfies that (caller falls back to XLA —
    tiny test shapes like KH=2, bs=16)."""
    for hg in range(min(KH, MAX_HG), 0, -1):
        if KH % hg == 0 and (block_size is None
                             or (hg * block_size) % 128 == 0):
            return hg
    return 0 if block_size is not None else 1


def pallas_supports(kv_cache) -> bool:
    """True if the fused decode kernel can compile for this cache
    (quant caches need a 128-lane-aligned head group)."""
    if not isinstance(kv_cache, QuantKV):
        return True
    data = kv_cache.data
    KH = data.shape[1] if is_packed_int4(data) else data.shape[1] // 2
    return _pick_head_group(KH, data.shape[2]) > 0


def _pick_row_batch(R: int, HG: int) -> int:
    for rb in (4, 2, 1):
        if R % rb == 0 and rb * HG <= MAX_UNROLL:
            return rb
    return 1


def _kernel(
    # scalar prefetch
    seq_lens_ref,  # [R] SMEM
    bt_ref,  # [R, max_blocks] SMEM
    # inputs
    q_ref,  # [RB, HG*G, Dp] VMEM block (row-batch queries, this group)
    new_kv_ref,  # [RB, 2*HG, Dp] VMEM block (new K/V rows, this group)
    kv_hbm,  # [num_blocks, 2*KH, bs, Dp] HBM (aliased to output)
    # outputs
    o_ref,  # [RB, HG*G, Dp] VMEM block
    kv_out,  # aliased kv_hbm
    # scratch
    k_buf,  # [RING, HG, F*bs, Dp] VMEM (K planes of this head group)
    v_buf,  # [RING, HG, F*bs, Dp] VMEM
    wk_buf,  # [RB, HG, bs, Dp] write-back staging (K)
    wv_buf,  # [RB, HG, bs, Dp] write-back staging (V)
    sems,  # DMA sems [RING, F, 2]
    wsem,  # write-back sems [RB, 2]
    *,
    sm_scale: float,
    block_size: int,
    KH: int,
    HG: int,
    G: int,
    RB: int,
    F: int,
    max_blocks: int,
    sliding_window: int | None,
    logit_softcap: float | None,
    fused: bool = False,
    interpret: bool = False,
):
    # fused=True (HG == KH, the GQA common case): K and V planes of a
    # block are one contiguous [2KH, bs, Dp] slab — ONE DMA fetches
    # both (halves descriptor issues + waits; the decode chain was
    # scalar-core-bound at the bench shape: ~0.4 us/superstep of
    # issue/wait overhead). k_buf then holds both plane sets
    # ([RING, 2HG, F*bs, Dp]); v_buf is a dummy.
    t = pl.program_id(0)
    hg = pl.program_id(1)
    head0 = hg * HG  # first K-plane slot of this group (V at KH +)
    row0 = t * RB
    FS = F * block_size
    seq_lens = [seq_lens_ref[row0 + r] for r in range(RB)]
    niters = [pl.cdiv(s, FS) for s in seq_lens]
    nit_max = functools.reduce(jnp.maximum, niters)
    first = 0
    if sliding_window is not None:
        # Supersteps fully below every row's window are skipped; the
        # per-row mask trims the rest.
        firsts = [jnp.maximum(s - sliding_window, 0) // FS
                  for s in seq_lens]
        first = functools.reduce(jnp.minimum, firsts)
    last_blks = [jnp.maximum(pl.cdiv(s, block_size) - 1, 0)
                 for s in seq_lens]
    offs = [(s - 1) % block_size for s in seq_lens]
    D = q_ref.shape[-1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)

    def dmas(slot, p, row0_, head0_, for_wait=False):
        """K+V slab copies for superstep p (= iter * RB + r) of the
        program owning (row0_, head0_), each gated on the block
        actually existing for its row — a short row in a long batch
        otherwise streams up to F-1 garbage blocks per superstep
        (measured 60% KV overfetch at the bench shape).
        for_wait=True builds shape-identical copy objects with STATIC
        src addresses (a wait only needs the semaphore + byte count —
        skip the block-table load + address arithmetic)."""
        it = p // RB
        r = p % RB
        nblk_r = pl.cdiv(seq_lens_ref[row0_ + r], block_size)
        cps = []
        for f in range(F):
            blk = it * F + f
            bidx = 0 if for_wait else jnp.minimum(blk, max_blocks - 1)
            bid = 0 if for_wait else bt_ref[row0_ + r, bidx]
            sub = pl.ds(f * block_size, block_size)
            if fused:
                cps.append((pltpu.make_async_copy(
                    kv_hbm.at[bid],
                    k_buf.at[slot, :, sub, :], sems.at[slot, f, 0]),
                    blk < nblk_r))
                continue
            cps.append((pltpu.make_async_copy(
                kv_hbm.at[bid, pl.ds(head0_, HG)],
                k_buf.at[slot, :, sub, :], sems.at[slot, f, 0]),
                blk < nblk_r))
            cps.append((pltpu.make_async_copy(
                kv_hbm.at[bid, pl.ds(KH + head0_, HG)],
                v_buf.at[slot, :, sub, :], sems.at[slot, f, 1]),
                blk < nblk_r))
        return cps

    def start(slot, p, row0_=None, head0_=None):
        row0_ = row0 if row0_ is None else row0_
        head0_ = head0 if head0_ is None else head0_
        for cp, cond in dmas(slot, p, row0_, head0_):
            @pl.when(cond)
            def _(cp=cp):
                cp.start()

    def wait(slot, p):
        for cp, cond in dmas(slot, p, row0, head0, for_wait=True):
            @pl.when(cond)
            def _(cp=cp):
                cp.wait()

    def first_for(row0_):
        if sliding_window is None:
            return 0
        fs = [jnp.maximum(seq_lens_ref[row0_ + r] - sliding_window, 0)
              // FS for r in range(RB)]
        return functools.reduce(jnp.minimum, fs)

    total = nit_max * RB
    p0 = first * RB

    # Cross-program prefetch (needs RB == RING for slot continuity):
    # each program starts the NEXT program's first RING supersteps as
    # its own ring winds down, so no program but the first ever stalls
    # on a cold DMA ring (measured ~9 us/call of per-program warmup
    # stalls at the bench shape: 8 sequential programs x first-DMA
    # latency). Non-first programs skip their own warmup — by
    # induction their first RING supersteps are already in flight
    # (a program whose rows are all empty issues nothing, but then
    # its successor's gated waits are no-ops too: empty rows never
    # wait; the all-empty case is handled by the total==0 epilogue).
    cross = RB == RING
    n_tp = pl.num_programs(0)
    n_hgp = pl.num_programs(1)
    last_hg = hg == n_hgp - 1
    next_row0 = jnp.minimum(jnp.where(last_hg, row0 + RB, row0),
                            (n_tp - 1) * RB)
    next_head0 = jnp.where(last_hg, 0, head0 + HG)
    not_last = jnp.logical_not((t == n_tp - 1) & last_hg)
    p0n = first_for(next_row0) * RB

    def prefetch_next(k, q):
        """Start next-program superstep p0n + q at slot k (== the slot
        its wait will use: (p0n + q) % RING == q since p0n % RING == 0
        when RB == RING)."""
        @pl.when(not_last)
        def _():
            start(k, p0n + q, next_row0, next_head0)

    # Skipped slots must hold finite bits: masked probabilities are
    # exactly 0, but 0 x NaN (uninitialized VMEM) still poisons the
    # p @ V dot. One zero-fill on the first program covers it — later
    # programs only ever see previously streamed (finite) KV.
    @pl.when((t == 0) & (hg == 0))
    def _():
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)

    if cross:
        @pl.when((t == 0) & (hg == 0))
        def _():
            for k in range(RING):
                @pl.when(p0 + k < total)
                def _(k=k):
                    start((p0 + k) % RING, p0 + k)
    else:
        for k in range(RING):
            @pl.when(p0 + k < total)
            def _(k=k):
                start((p0 + k) % RING, p0 + k)

    def body(it, carry):
        nc = list(carry)
        for r in range(RB):
            p = it * RB + r
            slot_h = p % RING
            wait(slot_h, p)

            # Inject this row's new K/V into its current block's tile
            # (mask select over the sublane dim) and write it back.
            @pl.when((it == last_blks[r] // F) & (seq_lens[r] > 0))
            def _(r=r, slot=slot_h):
                sub = pl.ds((last_blks[r] % F) * block_size, block_size)
                if fused:
                    # One batched select over the whole [2HG, bs, Dp]
                    # slab (the per-head loop was 2*HG small VPU ops).
                    tile = k_buf[slot, :, sub, :]
                    k_buf[slot, :, sub, :] = jnp.where(
                        row_iota[None, :, :] == offs[r],
                        new_kv_ref[r][:, None, :], tile)
                else:
                    for h in range(HG):
                        ktile = k_buf[slot, h, sub, :]
                        k_buf[slot, h, sub, :] = jnp.where(
                            row_iota == offs[r],
                            new_kv_ref[r, h, :][None, :], ktile)
                        vtile = v_buf[slot, h, sub, :]
                        v_buf[slot, h, sub, :] = jnp.where(
                            row_iota == offs[r],
                            new_kv_ref[r, HG + h, :][None, :], vtile)
                # Stage the modified tiles and write back ASYNC —
                # blocking here cost two DMA round trips per row per
                # program (the staging copy decouples the ring slot,
                # which the next superstep refills); the matching
                # waits run once after the flash loop.
                bid = bt_ref[row0 + r, last_blks[r]]
                if fused:
                    wk_buf[r] = k_buf[slot, :, sub, :]
                    pltpu.make_async_copy(
                        wk_buf.at[r], kv_out.at[bid],
                        wsem.at[r, 0]).start()
                else:
                    wk_buf[r] = k_buf[slot, :, sub, :]
                    wv_buf[r] = v_buf[slot, :, sub, :]
                    pltpu.make_async_copy(
                        wk_buf.at[r],
                        kv_out.at[bid, pl.ds(head0, HG)],
                        wsem.at[r, 0]).start()
                    pltpu.make_async_copy(
                        wv_buf.at[r],
                        kv_out.at[bid, pl.ds(KH + head0, HG)],
                        wsem.at[r, 1]).start()

            # All HG heads of this row in ONE pair of MXU dots:
            # scores [HG*G, HG*FS] = q_all @ K_all^T with a block-
            # diagonal head-match mask (off-diagonal cross-head blocks
            # are wasted MXU FLOPs — decode is DMA-bound, the MXU is
            # idle — in exchange for HG-fold fewer, fatter ops; the
            # old per-head unroll was small-dot-overhead-bound). The
            # split-plane cache layout makes K_all/V_all plain
            # reshapes of the streamed slabs.
            # Column geometry hoisted out of the loops.
            fp8 = k_buf.dtype == jnp.float8_e4m3fn
            kv_pos = it * FS + tok0
            mask = head_match & (kv_pos < seq_lens[r])
            if sliding_window is not None:
                # decode query position is seq_len - 1
                mask &= kv_pos > seq_lens[r] - 1 - sliding_window
            m, l, acc = nc[r]
            q_all = q_ref[r]  # [HG*G, Dp]
            if fp8:
                # scale-less fp8 cache: quad-byte magnitude decode
                # (fp8.py e4m3_quad_bf16; values * 2**-120 — the fix
                # rides q for the score dot and p_ for the output dot,
                # never applied after a dot: FTZ flushes denormal MXU
                # products).
                vbuf, voff = (k_buf, HG) if fused else (v_buf, 0)
                k_all = jnp.concatenate(
                    [e4m3_quad_bf16(k_buf[slot_h, h], interpret)
                     for h in range(HG)], axis=0).astype(q_all.dtype)
                v_all = jnp.concatenate(
                    [e4m3_quad_bf16(vbuf[slot_h, voff + h], interpret)
                     for h in range(HG)], axis=0).astype(q_all.dtype)
                q_all = q_all * jnp.asarray(E4M3_MAG_FIX, q_all.dtype)
            elif fused:
                k_all = k_buf[slot_h, :HG].reshape(
                    HG * FS, D).astype(q_all.dtype)
                v_all = k_buf[slot_h, HG:].reshape(
                    HG * FS, D).astype(q_all.dtype)
            else:
                k_all = k_buf[slot_h].reshape(HG * FS,
                                              D).astype(q_all.dtype)
                v_all = v_buf[slot_h].reshape(HG * FS,
                                              D).astype(q_all.dtype)
            s = jax.lax.dot_general(
                q_all, k_all, (((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if logit_softcap is not None:
                s = logit_softcap * jnp.tanh(s / logit_softcap)
            s = jnp.where(mask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            # exp(-1e30 - m_new) == 0 exactly for any row that ever
            # saw a valid column; rows that never do (seq 0 padding,
            # pre-window supersteps) accumulate finite garbage that a
            # later alpha = exp(-1e30 - m_real) = 0 wipes, or that the
            # caller discards — the explicit zero-select was a full
            # [rows, N] VPU pass per superstep.
            p_ = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p_, axis=1, keepdims=True)
            if fp8:
                p_ = p_ * E4M3_MAG_FIX  # V-side rebias (operand-side)
            acc_new = alpha * acc + jax.lax.dot_general(
                p_.astype(q_all.dtype), v_all,
                (((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)
            nc[r] = (m_new, l_new, acc_new)

            if cross:
                @pl.when(p + RING < total)
                def _(slot=slot_h, p=p):
                    start(slot, p + RING)

                @pl.when(p + RING >= total)
                def _(slot=slot_h, p=p):
                    prefetch_next(slot, p + RING - total)
            else:
                @pl.when(p + RING < total)
                def _(slot=slot_h, p=p):
                    start(slot, p + RING)
        return tuple(nc)

    row_head = jax.lax.broadcasted_iota(jnp.int32, (HG * G, 1), 0) // G
    _col = jax.lax.broadcasted_iota(jnp.int32, (1, HG * FS), 1)
    _tok = _col % FS
    if kv_hbm.dtype == jnp.float8_e4m3fn:
        # quad-byte decode emits [evens; odds] per head slab.
        _tok = parity_token_map(_tok, FS // 2)
    tok0 = _tok  # [1, HG*FS] kv offset at it == 0
    head_match = (_col // FS) == row_head
    init = tuple(
        (jnp.full((HG * G, 1), -1e30, jnp.float32),
         jnp.zeros((HG * G, 1), jnp.float32),
         jnp.zeros((HG * G, D), jnp.float32)) for _ in range(RB))
    final = jax.lax.fori_loop(first, nit_max, body, init)
    if cross:
        # All-empty program (total == 0): the loop never ran, so keep
        # the prefetch chain alive for the successor here.
        @pl.when(total == 0)
        def _():
            for k in range(RING):
                prefetch_next(k, k)
    for r in range(RB):
        # Drain this row's (conditional) write-back before returning
        # (static-address wait objects: sem + byte count suffice).
        @pl.when(seq_lens[r] > 0)
        def _(r=r):
            if fused:
                pltpu.make_async_copy(
                    wk_buf.at[r], kv_out.at[0], wsem.at[r, 0]).wait()
            else:
                pltpu.make_async_copy(
                    wk_buf.at[r], kv_out.at[0, pl.ds(head0, HG)],
                    wsem.at[r, 0]).wait()
                pltpu.make_async_copy(
                    wv_buf.at[r], kv_out.at[0, pl.ds(KH + head0, HG)],
                    wsem.at[r, 1]).wait()
        m, l, acc = final[r]
        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[r, :, :] = out.astype(o_ref.dtype)


def _qkernel(
    # scalar prefetch
    seq_lens_ref,  # [R] SMEM
    bt_ref,  # [R, max_blocks] SMEM
    # inputs
    q_ref,  # [RB, HG*G, Dp] VMEM block
    new_kv_ref,  # [RB, 2*HG, Dp] VMEM block (float; K rows then V rows)
    kv_hbm,  # [num_blocks, 2*KH|KH, bs, Dp] int8/fp8/uint8 (aliased)
    sc_hbm,  # [num_blocks, SUBLANE, SL] f32 (aliased)
    # outputs
    o_ref,  # [RB, HG*G, Dp] VMEM block
    kv_out,  # aliased kv_hbm
    sc_out,  # aliased sc_hbm
    # scratch (packed: data_buf only; else data_buf=K, v_buf=V)
    data_buf,  # [RING, F, HG, bs, Dp] quant dtype
    v_buf,  # [RING, F, HG, bs, Dp] or None (packed)
    s_buf,  # [RING, F, SUBLANE, SL] f32
    wd_buf,  # [RB, HG, bs, Dp] write-back staging (data)
    wv_buf,  # [RB, HG, bs, Dp] staging (V; dummy when packed)
    ws_buf,  # [RB, SUBLANE, SL] staging (scales)
    sems,  # DMA sems [RING, F, 3]
    wsem,  # write-back sems [RB, 3]
    *,
    sm_scale: float,
    block_size: int,
    KH: int,
    HG: int,
    G: int,
    RB: int,
    F: int,
    max_blocks: int,
    sliding_window: int | None,
    logit_softcap: float | None,
    packed: bool = False,
    levels: tuple | None = None,
    fused: bool = False,
    interpret: bool = False,
):
    """Per-token-head quantized variant of _kernel — same multi-block
    supersteps and head-batched dots; dequantization stays exact by
    applying lane-resident K-scales to score columns and V-scales to
    prob columns (the split-plane scale layout's (head, token) lane
    order matches the batched score-matrix columns, so the column
    scale row is F lane-concats, zero transposes). The fused write
    quantizes the new row in-kernel with the XLA path's round rules.
    Ref analog: int4_per_token_head.py store+attend pair.

    packed=True: nibble modes (int4 per-token-head + RHT, or TurboQuant
    codebook when ``levels`` is given). The cache plane layout is
    [B, KH, bs, Dp] uint8 with K in the low nibble and V in the high
    nibble (kv_cache.py make_kv_cache); q/new_kv arrive RHT-rotated and
    the caller un-rotates the output, so in-kernel math runs entirely
    in the rotated basis (scores are exact: H is orthonormal)."""
    t = pl.program_id(0)
    hg = pl.program_id(1)
    SL = s_buf.shape[-1]
    head0 = hg * HG
    row0 = t * RB
    FS = F * block_size
    N = F * HG * block_size  # batched column count per superstep
    seq_lens = [seq_lens_ref[row0 + r] for r in range(RB)]
    niters = [pl.cdiv(s, FS) for s in seq_lens]
    nit_max = functools.reduce(jnp.maximum, niters)
    first = 0
    if sliding_window is not None:
        firsts = [jnp.maximum(s - sliding_window, 0) // FS
                  for s in seq_lens]
        first = functools.reduce(jnp.minimum, firsts)
    last_blks = [jnp.maximum(pl.cdiv(s, block_size) - 1, 0)
                 for s in seq_lens]
    offs = [(s - 1) % block_size for s in seq_lens]
    D = q_ref.shape[-1]
    qdtype = data_buf.dtype
    qmax = quant_max(qdtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SL), 1)

    def dmas(slot, p, row0_, head0_, for_wait=False):
        # for_wait=True: static-address copy objects (wait needs only
        # the semaphore + byte count; skip bt_ref loads + addressing).
        it = p // RB
        r = p % RB
        nblk_r = pl.cdiv(seq_lens_ref[row0_ + r], block_size)
        cps = []
        for f in range(F):
            blk = it * F + f
            cond = blk < nblk_r
            if for_wait:
                bid = 0
            else:
                bidx = jnp.minimum(blk, max_blocks - 1)
                bid = bt_ref[row0_ + r, bidx]
            if packed:
                cps.append((pltpu.make_async_copy(
                    kv_hbm.at[bid, pl.ds(head0_, HG)],
                    data_buf.at[slot, f], sems.at[slot, f, 0]), cond))
            elif fused:
                # HG == KH: the whole [2KH, bs, Dp] K+V slab in ONE
                # DMA (halves descriptor issues + waits).
                cps.append((pltpu.make_async_copy(
                    kv_hbm.at[bid],
                    data_buf.at[slot, f], sems.at[slot, f, 0]), cond))
            else:
                cps.append((pltpu.make_async_copy(
                    kv_hbm.at[bid, pl.ds(head0_, HG)],
                    data_buf.at[slot, f], sems.at[slot, f, 0]), cond))
                cps.append((pltpu.make_async_copy(
                    kv_hbm.at[bid, pl.ds(KH + head0_, HG)],
                    v_buf.at[slot, f], sems.at[slot, f, 1]), cond))
            cps.append((pltpu.make_async_copy(
                sc_hbm.at[bid], s_buf.at[slot, f],
                sems.at[slot, f, 2]), cond))
        return cps

    def start(slot, p, row0_=None, head0_=None):
        row0_ = row0 if row0_ is None else row0_
        head0_ = head0 if head0_ is None else head0_
        for cp, cond in dmas(slot, p, row0_, head0_):
            @pl.when(cond)
            def _(cp=cp):
                cp.start()

    def wait(slot, p):
        for cp, cond in dmas(slot, p, row0, head0, for_wait=True):
            @pl.when(cond)
            def _(cp=cp):
                cp.wait()

    def first_for(row0_):
        if sliding_window is None:
            return 0
        fs = [jnp.maximum(seq_lens_ref[row0_ + r] - sliding_window, 0)
              // FS for r in range(RB)]
        return functools.reduce(jnp.minimum, fs)

    total = nit_max * RB
    p0 = first * RB

    # Cross-program prefetch (see _kernel): kill the per-program DMA
    # ring warmup stall. Requires RB == RING for slot continuity.
    cross = RB == RING
    n_tp = pl.num_programs(0)
    n_hgp = pl.num_programs(1)
    last_hg = hg == n_hgp - 1
    next_row0 = jnp.minimum(jnp.where(last_hg, row0 + RB, row0),
                            (n_tp - 1) * RB)
    next_head0 = jnp.where(last_hg, 0, head0 + HG)
    not_last = jnp.logical_not((t == n_tp - 1) & last_hg)
    p0n = first_for(next_row0) * RB

    def prefetch_next(k, q):
        @pl.when(not_last)
        def _():
            start(k, p0n + q, next_row0, next_head0)

    # Finite-bits guarantee for skipped slots (see _kernel).
    @pl.when((t == 0) & (hg == 0))
    def _():
        data_buf[...] = jnp.zeros_like(data_buf)
        if not packed:
            v_buf[...] = jnp.zeros_like(v_buf)
        s_buf[...] = jnp.zeros_like(s_buf)

    if cross:
        @pl.when((t == 0) & (hg == 0))
        def _():
            for k in range(RING):
                @pl.when(p0 + k < total)
                def _(k=k):
                    start((p0 + k) % RING, p0 + k)
    else:
        for k in range(RING):
            @pl.when(p0 + k < total)
            def _(k=k):
                start((p0 + k) % RING, p0 + k)

    def _quant_plane(rowf):
        """Quantize one rotated [1, Dp] f32 row to nibble indices +
        scale — bit-identical to kv_cache.quantize_rows_int4 /
        quantize_rows_tq (packed modes only)."""
        if levels is not None:  # TurboQuant codebook: RMS + snap
            scale = jnp.sqrt(jnp.mean(rowf * rowf, axis=1,
                                      keepdims=True))
            inv = jnp.where(scale > 0.0, 1.0 / jnp.where(
                scale > 0.0, scale, 1.0), 0.0)
            norm = rowf * inv
            idx = jnp.zeros_like(norm, dtype=jnp.int32)
            import numpy as _np
            for j in range(1, len(levels)):
                # f32 midpoint arithmetic: bit-matches the XLA path's
                # searchsorted over an f32 midpoint array.
                mid = float((_np.float32(levels[j]) +
                             _np.float32(levels[j - 1])) *
                            _np.float32(0.5))
                idx = idx + (norm > mid).astype(jnp.int32)
            return idx, scale
        amax = jnp.max(jnp.abs(rowf), axis=1, keepdims=True)
        scale = amax / 7.0
        inv = jnp.where(scale > 0.0, 1.0 / jnp.where(
            scale > 0.0, scale, 1.0), 0.0)
        idx = jnp.clip(jnp.floor(rowf * inv + 0.5), -7.0,
                       7.0).astype(jnp.int32) + 8
        return idx, scale

    def _quant_row(rowf):
        """int8/fp8 per-token-head quantization (unpacked modes) —
        bit-identical to kv_cache.quantize_rows."""
        amax = jnp.max(jnp.abs(rowf), axis=1, keepdims=True)
        scale = amax / qmax
        inv = jnp.where(scale > 0.0, 1.0 / jnp.where(
            scale > 0.0, scale, 1.0), 0.0)
        scaled = rowf * inv
        if qdtype == jnp.int8:
            qrow = jnp.clip(jnp.floor(scaled + 0.5), -qmax,
                            qmax).astype(jnp.int32).astype(jnp.int8)
        else:
            # Flush sub-2^-6 magnitudes to zero so the stored codes
            # round-trip the FTZ hot-path decode exactly (fp8.py
            # e4m3ftz_to_f32; same formula in kv_cache.quantize_rows).
            scaled = jnp.where(jnp.abs(scaled) < 0.015625, 0.0, scaled)
            qrow = scaled.astype(qdtype)
        return qrow, scale

    def _lut(idx):
        return codebook_select(idx, levels)

    def body(it, carry):
        nc = list(carry)
        for r in range(RB):
            p = it * RB + r
            slot_h = p % RING
            wait(slot_h, p)

            # Quantize + inject this row's new K/V into the current
            # block's tiles (data + scale plane), write both back.
            @pl.when((it == last_blks[r] // F) & (seq_lens[r] > 0))
            def _(r=r, slot=slot_h):
                fl = last_blks[r] % F
                k_srow = s_buf[slot, fl, 0:1, :]
                v_srow = s_buf[slot, fl, 1:2, :]
                fp8 = qdtype == jnp.float8_e4m3fn and not packed
                # fp8_pth stores scale lanes parity-split to match
                # the quad-byte decode's [evens; odds] emission
                # (kv_cache.parity_scale_lane).
                soff = (parity_scale_lane(offs[r], block_size)
                        if fp8 else offs[r])
                if fused:
                    # Batched inject: quantize all 2KH rows in one
                    # pass and select into the whole [2KH, bs, Dp]
                    # slab (the per-head loop was 2*HG small VPU ops
                    # each — measured on the skeleton as a real share
                    # of the per-call fixed cost).
                    rows_f = new_kv_ref[r].astype(jnp.float32)
                    qrows, srows = _quant_row(rows_f)  # [2KH, Dp]/[,1]
                    tile = data_buf[slot, fl]
                    data_buf[slot, fl] = jnp.where(
                        row_iota[None, :, :] == offs[r],
                        qrows[:, None, :], tile)
                    for h in range(HG):
                        lane = h * block_size + soff
                        k_srow = jnp.where(lane_iota == lane,
                                           srows[h:h + 1, 0:1], k_srow)
                        v_srow = jnp.where(lane_iota == lane,
                                           srows[KH + h:KH + h + 1,
                                                 0:1], v_srow)
                else:
                    for h in range(HG):
                        lane = (head0 + h) * block_size + soff
                        kf = new_kv_ref[r, h, :][None, :].astype(
                            jnp.float32)
                        vf = new_kv_ref[r, HG + h, :][None, :].astype(
                            jnp.float32)
                        if packed:
                            k_i, k_sc = _quant_plane(kf)
                            v_i, v_sc = _quant_plane(vf)
                            byte = (k_i | (v_i << 4)).astype(jnp.uint8)
                            tile = data_buf[slot, fl, h]
                            data_buf[slot, fl, h] = jnp.where(
                                row_iota == offs[r], byte, tile)
                        else:
                            kq, k_sc = _quant_row(kf)
                            vq, v_sc = _quant_row(vf)
                            ktile = data_buf[slot, fl, h]
                            data_buf[slot, fl, h] = jnp.where(
                                row_iota == offs[r], kq, ktile)
                            vtile = v_buf[slot, fl, h]
                            v_buf[slot, fl, h] = jnp.where(
                                row_iota == offs[r], vq, vtile)
                        k_srow = jnp.where(lane_iota == lane, k_sc,
                                           k_srow)
                        v_srow = jnp.where(lane_iota == lane, v_sc,
                                           v_srow)
                s_buf[slot, fl, 0:1, :] = k_srow
                s_buf[slot, fl, 1:2, :] = v_srow
                # Stage + ASYNC write-back (see _kernel): the blocking
                # per-row round trips were the decode chain's fixed
                # cost; matching waits drain after the flash loop.
                wd_buf[r] = data_buf[slot, fl]
                ws_buf[r] = s_buf[slot, fl]
                bid = bt_ref[row0 + r, last_blks[r]]
                pltpu.make_async_copy(
                    wd_buf.at[r],
                    kv_out.at[bid] if fused else
                    kv_out.at[bid, pl.ds(head0, HG)],
                    wsem.at[r, 0]).start()
                if not packed and not fused:
                    wv_buf[r] = v_buf[slot, fl]
                    pltpu.make_async_copy(
                        wv_buf.at[r],
                        kv_out.at[bid, pl.ds(KH + head0, HG)],
                        wsem.at[r, 1]).start()
                pltpu.make_async_copy(
                    ws_buf.at[r], sc_out.at[bid],
                    wsem.at[r, 2]).start()

            # Head-batched flash update over all F blocks (columns in
            # (block, head, token) order — matching the scale lanes'
            # (head, token) order within each block; fp8 columns run
            # (block, head, [even tokens; odd tokens]) to match the
            # quad-byte decode's emission order).
            # Column geometry hoisted out of the loops (invariant
            # across rows and, but for the `it` shift, supersteps).
            fp8 = qdtype == jnp.float8_e4m3fn and not packed
            kv_pos = it * FS + tok0
            mask = head_match & (kv_pos < seq_lens[r])
            if sliding_window is not None:
                mask &= kv_pos > seq_lens[r] - 1 - sliding_window
            m, l, acc = nc[r]
            q_all = q_ref[r]  # [HG*G, Dp]
            lane0 = head0 * block_size
            # One [2, N] concat covers both scale rows (half the
            # per-superstep slice count of separate K/V concats).
            s_kv = jnp.concatenate(
                [s_buf[slot_h, f, 0:2, pl.ds(lane0, HG * block_size)]
                 for f in range(F)], axis=1)  # [2, N]
            s_k = s_kv[0:1]
            s_v = s_kv[1:2]
            if packed:
                byte = data_buf[slot_h].reshape(N, D).astype(jnp.int32)
                k_i = byte & 0xF
                v_i = byte >> 4
                if levels is not None:
                    k_all = _lut(k_i).astype(q_all.dtype)
                    v_all = _lut(v_i).astype(q_all.dtype)
                else:
                    # i32 -> f32 via exponent-bias (fp8.py int8_to_f32
                    # rationale): OR into 2^23, subtract 2^23 + 8.
                    k_all = (pltpu.bitcast(k_i | 0x4B000000, jnp.float32)
                             - (8388608.0 + 8.0)).astype(q_all.dtype)
                    v_all = (pltpu.bitcast(v_i | 0x4B000000, jnp.float32)
                             - (8388608.0 + 8.0)).astype(q_all.dtype)
            elif qdtype == jnp.int8:
                if fused:
                    k_all = int8_to_f32(data_buf[slot_h, :, :KH].reshape(
                        N, D)).astype(q_all.dtype)
                    v_all = int8_to_f32(data_buf[slot_h, :, KH:].reshape(
                        N, D)).astype(q_all.dtype)
                else:
                    k_all = int8_to_f32(data_buf[slot_h].reshape(
                        N, D)).astype(q_all.dtype)
                    v_all = int8_to_f32(v_buf[slot_h].reshape(
                        N, D)).astype(q_all.dtype)
            else:
                # fp8: quad-byte magnitude decode per (block, head)
                # tile (fp8.py e4m3_quad_bf16; ~3.5x fewer VPU ops
                # than the widened per-element decode). Values come
                # out * 2**-120 in [evens; odds] row order: the
                # 2**120 rides q (scores) and s_v (output dot) — on
                # an *operand*, never after a dot (FTZ flushes
                # denormal products).
                vbuf, voff = (data_buf, KH) if fused else (v_buf, 0)
                k_all = jnp.concatenate([
                    e4m3_quad_bf16(data_buf[slot_h, f, h], interpret)
                    for f in range(F) for h in range(HG)
                ], axis=0).astype(q_all.dtype)
                v_all = jnp.concatenate([
                    e4m3_quad_bf16(vbuf[slot_h, f, voff + h], interpret)
                    for f in range(F) for h in range(HG)
                ], axis=0).astype(q_all.dtype)
                q_all = q_all * jnp.asarray(E4M3_MAG_FIX, q_all.dtype)
                s_v = s_v * E4M3_MAG_FIX
            s = jax.lax.dot_general(
                q_all, k_all, (((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32)
            # dequant K on score columns; sm_scale folded into the
            # [1, N] scale row (one fewer full-width VPU pass)
            s = s * (s_k * sm_scale)
            if logit_softcap is not None:
                s = logit_softcap * jnp.tanh(s / logit_softcap)
            s = jnp.where(mask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            # exp(-1e30 - m_new) == 0 exactly for any row that ever
            # saw a valid column; rows that never do (seq 0 padding,
            # pre-window supersteps) accumulate finite garbage that a
            # later alpha = exp(-1e30 - m_real) = 0 wipes, or that the
            # caller discards — the explicit zero-select was a full
            # [rows, N] VPU pass per superstep.
            p_ = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p_, axis=1, keepdims=True)
            acc_new = alpha * acc + jax.lax.dot_general(
                (p_ * s_v).astype(q_all.dtype), v_all,
                (((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)
            nc[r] = (m_new, l_new, acc_new)

            @pl.when(p + RING < total)
            def _(slot=slot_h, p=p):
                start(slot, p + RING)
        return tuple(nc)

    row_head = jax.lax.broadcasted_iota(jnp.int32, (HG * G, 1), 0) // G
    _col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    _f_idx = _col // (HG * block_size)
    _rem = _col % (HG * block_size)
    _tok = _rem % block_size
    if qdtype == jnp.float8_e4m3fn and not packed:
        _tok = parity_token_map(_tok, block_size // 2)
    tok0 = _f_idx * block_size + _tok  # [1, N] kv offset at it == 0
    head_match = (_rem // block_size) == row_head  # [HG*G, N]
    init = tuple(
        (jnp.full((HG * G, 1), -1e30, jnp.float32),
         jnp.zeros((HG * G, 1), jnp.float32),
         jnp.zeros((HG * G, D), jnp.float32)) for _ in range(RB))
    final = jax.lax.fori_loop(first, nit_max, body, init)
    if cross:
        # All slots are consumed after the flash loop: issue the NEXT
        # program's first RING supersteps here, in one batch — off the
        # per-superstep critical path (the mid-loop variant measurably
        # slowed this scalar-busier kernel), still ahead of the next
        # program's first wait.
        for k in range(RING):
            prefetch_next(k, k)
    for r in range(RB):
        # Static-address wait objects (sem + byte count suffice).
        @pl.when(seq_lens[r] > 0)
        def _(r=r):
            pltpu.make_async_copy(
                wd_buf.at[r],
                kv_out.at[0] if fused else
                kv_out.at[0, pl.ds(head0, HG)],
                wsem.at[r, 0]).wait()
            if not packed and not fused:
                pltpu.make_async_copy(
                    wv_buf.at[r],
                    kv_out.at[0, pl.ds(KH + head0, HG)],
                    wsem.at[r, 1]).wait()
            pltpu.make_async_copy(
                ws_buf.at[r], sc_out.at[0], wsem.at[r, 2]).wait()
        m, l, acc = final[r]
        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[r, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "sliding_window",
                                    "logit_softcap", "interpret"))
def decode_paged_attention(
    q: jax.Array,  # [R, H, D]
    new_k: jax.Array,  # [R, KH, D] this step's K rows
    new_v: jax.Array,  # [R, KH, D]
    kv_cache,  # [num_blocks, 2*KH, bs, Dp] (donated) or QuantKV
    block_tables: jax.Array,  # [R, max_blocks]
    seq_lens: jax.Array,  # [R] length INCLUDING the new token
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    interpret: bool = False,
):
    """Returns (attn_out [R, H, D], updated kv_cache)."""
    R, H, D = q.shape
    quant = isinstance(kv_cache, QuantKV)
    data = kv_cache.data if quant else kv_cache
    packed = quant and is_packed_int4(data)
    num_blocks, planes, block_size, Dp = data.shape
    KH = planes if packed else planes // 2
    kh2 = 2 * KH
    G = H // KH
    # interpret mode (CPU tests) has no Mosaic alignment constraint.
    HG = _pick_head_group(
        KH, block_size if quant and not interpret else None)
    assert HG > 0, "unaligned quant cache — gate on pallas_supports()"
    n_hg = KH // HG
    RB = _pick_row_batch(R, HG)
    if D < Dp:
        pad = [(0, 0), (0, 0), (0, Dp - D)]
        q = jnp.pad(q, pad)
        new_k = jnp.pad(new_k, pad)
        new_v = jnp.pad(new_v, pad)
    # Group K/V rows per head group: [R, n_hg * 2HG, Dp] with group
    # g's K rows first, then its V rows (the kernel's BlockSpec slices
    # one group per grid column).
    new_kv = jnp.concatenate(
        [new_k.reshape(R, n_hg, HG, Dp),
         new_v.reshape(R, n_hg, HG, Dp)], axis=2).reshape(R, kh2, Dp)
    if quant:
        out_dtype = q.dtype
        if packed:
            # RHT modes: rotate q/new_kv into the cache's basis, run
            # the kernel entirely there (scores exact — H orthonormal),
            # un-rotate the output. f32 new_kv keeps the in-kernel
            # quantization bit-equal to kv_cache.quantize_rows_int4/tq.
            rot = _rht_matrix(Dp)
            q = (q.astype(jnp.float32) @ rot).astype(out_dtype)
            new_kv = new_kv.astype(jnp.float32) @ rot
        out, kv_cache = _decode_quant(
            q, new_kv, kv_cache, block_tables, seq_lens,
            sm_scale=sm_scale, KH=KH, HG=HG, n_hg=n_hg, G=G, RB=RB,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
            packed=packed, interpret=interpret)
        if packed:
            out = (out.astype(jnp.float32) @ rot.T).astype(out_dtype)
        return out[..., :D], kv_cache
    if kv_cache.dtype == jnp.float8_e4m3fn:
        # FTZ encode, matching e4m3ftz_to_f32 / write_kv_xla.
        new_kv = jnp.where(
            jnp.abs(new_kv.astype(jnp.float32)) < 0.015625, 0.0,
            new_kv.astype(jnp.float32))
    new_kv = new_kv.astype(kv_cache.dtype)

    F = F_BLOCKS
    fused = HG == KH  # one DMA fetches the contiguous K+V slab
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R // RB, n_hg),
        in_specs=[
            pl.BlockSpec((RB, HG * G, Dp), lambda t, g, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),  # q row batch
            pl.BlockSpec((RB, 2 * HG, Dp), lambda t, g, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),  # new kv row batch
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv cache
        ],
        out_specs=(
            pl.BlockSpec((RB, HG * G, Dp), lambda t, g, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((RING, 2 * HG if fused else HG,
                        F * block_size, Dp), kv_cache.dtype),
            pltpu.VMEM((1, 1, 1, 1) if fused else
                       (RING, HG, F * block_size, Dp), kv_cache.dtype),
            pltpu.VMEM((RB, 2 * HG if fused else HG, block_size, Dp),
                       kv_cache.dtype),
            pltpu.VMEM((1, 1, 1, 1) if fused else
                       (RB, HG, block_size, Dp), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((RING, F, 2)),
            pltpu.SemaphoreType.DMA((RB, 2)),
        ],
    )
    out, kv_cache = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale,
                          block_size=block_size, KH=KH, HG=HG, G=G,
                          RB=RB, F=F,
                          max_blocks=block_tables.shape[1],
                          sliding_window=sliding_window,
                          logit_softcap=logit_softcap,
                          fused=fused, interpret=interpret),
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
    KH: int,
    HG: int,
    n_hg: int,
    G: int,
    RB: int,
    sliding_window: int | None,
    logit_softcap: float | None,
    packed: bool,
    interpret: bool,
) -> tuple[jax.Array, QuantKV]:
    data, scales = kv_cache.data, kv_cache.scales
    R, H, Dp = q.shape
    block_size = data.shape[2]
    SUB, SL = scales.shape[1], scales.shape[2]
    F = F_BLOCKS
    # Static level table for the in-kernel select chain (the traced
    # codebook leaf can't be read at trace time; its *length* is static
    # and identifies the mode — kv_cache.tq_codebook).
    levels = (None if kv_cache.codebook is None else
              TQ4_LEVELS if kv_cache.codebook.shape[0] == 16 else
              TQ3_LEVELS)

    fused = (not packed) and HG == KH  # one DMA per K+V block slab
    scratch = [
        pltpu.VMEM((RING, F, 2 * HG if fused else HG, block_size, Dp),
                   data.dtype),
        # v_buf is unused for packed modes (K|V share a byte plane)
        # and for fused (V rides in data_buf's upper planes); a
        # minimal dummy keeps the kernel signature uniform.
        pltpu.VMEM((1, 1) if (packed or fused) else
                   (RING, F, HG, block_size, Dp), data.dtype),
        pltpu.VMEM((RING, F, SUB, SL), jnp.float32),
        pltpu.VMEM((RB, 2 * HG if fused else HG, block_size, Dp),
                   data.dtype),
        pltpu.VMEM((1, 1) if (packed or fused) else
                   (RB, HG, block_size, Dp), data.dtype),
        pltpu.VMEM((RB, SUB, SL), jnp.float32),
        pltpu.SemaphoreType.DMA((RING, F, 3)),
        pltpu.SemaphoreType.DMA((RB, 3)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R // RB, n_hg),
        in_specs=[
            pl.BlockSpec((RB, HG * G, Dp), lambda t, g, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),  # q row batch
            pl.BlockSpec((RB, 2 * HG, Dp), lambda t, g, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),  # new kv row batch
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv data
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv scales
        ],
        out_specs=(
            pl.BlockSpec((RB, HG * G, Dp), lambda t, g, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=scratch,
    )
    out, data, scales = pl.pallas_call(
        functools.partial(_qkernel, sm_scale=sm_scale,
                          block_size=block_size, KH=KH, HG=HG, G=G,
                          RB=RB, F=F,
                          max_blocks=block_tables.shape[1],
                          sliding_window=sliding_window,
                          logit_softcap=logit_softcap,
                          packed=packed, levels=levels,
                          fused=fused, interpret=interpret),
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
            flops=4 * R * H * Dp * 1024,
            bytes_accessed=int(data.size * data.dtype.itemsize),
            transcendentals=R * H * 1024,
        ),
        interpret=interpret,
    )(seq_lens, block_tables, q, new_kv, data, scales)
    return out, QuantKV(data, scales, kv_cache.codebook)
