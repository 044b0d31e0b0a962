"""Pallas TPU kernel: fused W4A16 group-dequant GEMM (the north-star
kernel, SURVEY.md §7).

HBM traffic per weight element: 0.5 byte (nibbles) + ~4/group_size
bytes of scale/zbias — vs 2 bytes for bf16. The decode regime is
memory-bound, so the kernel is built around the weight stream:

1. **Deferred-scale epilogue** (measured +35% over dequant-in-loop).
   The inner loop feeds raw levels straight to the MXU; group
   scales/zero-biases apply to the *accumulator*:

       y  = sum_g (x_g @ q_g) * s_g  +  rowsum(x_g) * zb_g

   which is exact because s/zb are constant within a group: the fma
   moves from K x N elements to T x N, negligible at decode T.
   (Ref analog: marlin's dequant-in-epilogue, csrc/.../marlin/.)
2. **Magic-mantissa nibble decode** (measured: the dequant chain was
   VPU-bound — Mosaic has no u8->bf16 vector cast). ``0x4300 |
   nibble`` is the bf16 bit pattern for ``128 + q`` exactly (exponent
   2^7 puts the nibble in ULP=1 mantissa bits). The +128 offset folds
   into the epilogue's zero-bias term in f32 (``zb' = zb - 128*s``),
   costing one fma on a [1, bn] tile per group: exact, free.
3. **Quad-row interleaved layout + 0xF000F double-insert** (r3; the
   r2 K-pair layout cost 6 VPU ops per 2 weights on full-width i32
   lanes). The packed bytes are viewed as i32 WITHOUT widening
   (pltpu.bitcast u8->i32: VMEM stores u8 in (·,128)(4,1) tiles, so
   4 consecutive byte rows already live in one 32-bit register row,
   little-endian — verified on v5e). Each i32 lane holds 4 bytes = 8
   nibbles; one AND against 0xF000F selects TWO nibbles straight into
   the two bf16 mantissa slots:

       t  = bitcast_u8_to_i32(packed)              # [16, bn] per group
       oS = ((t >> S) & 0xF000F) | 0x43004300      # S in (0, 4, 8, 12)
       w  = bitcast(concat([o0 o1 o2 o3]), bf16)   # [128, bn] = 128+q

   11 VPU ops on quarter-height [16, bn] tiles per 128-row group
   (~0.7 lane-ops/weight vs 3.0 before). Prepack places each weight k
   at exactly the (byte-row, nibble) the chain reads it from (see
   _LO/_HI below); qweight stays [n_n, G, 64, bn] so each grid step's
   weight read remains one contiguous 0.4-1.5MB HBM burst. Prepack
   happens once at engine init (prepare_weights — the analog of
   process_weights_after_loading); the flat half-split [K/2, N] layout
   (quant/ref.py) remains the canonical checkpoint/leaf format.

Grid (T_tiles, N_tiles, K_groups/gsup), K innermost; fp32 accumulator
scratch persists across K (sequential grid), output written on the
last K step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _onp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.utils import cdiv

BK = 128  # K rows per k-tile (= one quant group of group_size 128)
BROWS = BK // 2  # packed byte rows per k-tile

# Quad-row interleave: byte row r of a group tile (r = 4j + m) holds
# weights (_LO[r], _HI[r]) in its (low, high) nibble. Derived from the
# decode chain: i32 row j = byte rows (4j..4j+3) little-endian; output
# oS (S = 0,4,8,12) contributes bf16 rows [8*S + 2j, 8*S + 2j + 1]
# from bytes (4j, 4j+2) at nibble position S — so the decoded k order
# comes out 0..127 after the concat.
_J2 = 2 * _onp.arange(16)
_LO = _onp.empty(BROWS, _onp.int32)
_LO[0::4] = _J2          # o0 even rows: byte 4j low nibble
_LO[1::4] = 64 + _J2     # o2 even rows: byte 4j+1 low nibble
_LO[2::4] = _J2 + 1      # o0 odd rows:  byte 4j+2 low nibble
_LO[3::4] = 64 + _J2 + 1  # o2 odd rows: byte 4j+3 low nibble
_HI = _LO + 32           # o1/o3: same bytes, high nibble
# Inverse (interpret-mode decode + unpack): weight k lives at byte row
# _ROW[k], shifted by _SHIFT[k].
_ROW = _onp.empty(BK, _onp.int32)
_SHIFT = _onp.empty(BK, _onp.int32)
_ROW[_LO] = _onp.arange(BROWS)
_SHIFT[_LO] = 0
_ROW[_HI] = _onp.arange(BROWS)
_SHIFT[_HI] = 4


def pick_bn(N: int, bt: int) -> int:
    """Widest N tile that divides N (fewer grid steps, fatter DMAs);
    capped when the T tile is large so the f32 accumulator stays well
    inside scoped VMEM. Non-power-of-two candidates cover the fused
    qkv width (N=6144: bn=6144 measured ~20% faster than 2048 at
    decode T — grid-step count dominates small calls)."""
    cap = 6144 if bt <= 64 else 2048
    for cand in (6144, 4096, 3072, 2048, 1024, 512, 256, 128):
        if cand <= cap and N % cand == 0:
            return cand
    return N


def pick_bt(T: int) -> int:
    return min(256, max(8, 1 << (T - 1).bit_length()))


def pick_gsup(G: int, bn: int, bt: int, n_n: int = 1) -> int:
    """Groups per grid step: fatter weight DMAs / fewer grid steps,
    bounded two ways (r5 retune, measured per-shape on v5e):
    - double-buffered weight+x blocks stay in scoped VMEM;
    - the TOTAL grid (n_n * G/gsup) keeps >= 8 steps, so the pipeline
      prologue/epilogue bubbles stay a small fraction. gsup=8 was
      +2.7% on long-pipeline shapes (gate_up/down/lm_head) but -9% on
      short ones (qkv/o: 4 steps) — the r4 "gsup=8 neutral-to-worse"
      negative only holds when it shortens the pipeline below ~8."""
    # VMEM budget accounts for the f32 accumulator + double-buffered
    # output blocks (bt=256/bn=4096 at gsup=8 blew the default 16 MiB
    # scoped limit); weight/x blocks are double-buffered by the
    # pipeline.
    fixed = bt * bn * 4 + 2 * bt * bn * 2  # acc + out (x2 buffers)
    budget_w = max(2 << 20, (12 << 20) - fixed)
    best = 1
    for g in (8, 4, 2, 1):
        if G % g == 0 and 2 * g * (BROWS * bn + bt * BK * 2) <= budget_w:
            if best == 1:
                best = g  # largest VMEM-feasible (fallback)
            if n_n * (G // g) >= 8:
                return g
    return best


def prepack_tiled(qweight: jax.Array, bn: int) -> jax.Array:
    """Canonical half-split [K/2, N] uint8 -> quad-row-interleaved
    tile-major [n_n, G, BROWS, bn] (contiguous per-grid-step reads;
    byte row r of a group holds q[_LO[r]] | q[_HI[r]] << 4 so the
    in-kernel 0xF000F double-insert emits weights in k order)."""
    K2, N = qweight.shape
    # canonical (256-tile half-split) -> raw levels [K, N]
    t = qweight.reshape(K2 // 128, 128, N)
    q = jnp.stack([t & 0xF, t >> 4], axis=1).reshape(2 * K2, N)
    G = (2 * K2) // BK
    q3 = q.reshape(G, BK, N)
    p = (q3[:, _LO] | (q3[:, _HI] << 4)).astype(jnp.uint8)  # [G,BROWS,N]
    return p.reshape(G, BROWS, N // bn, bn).transpose(2, 0, 1, 3)


def unpack_tiled(tiled: jax.Array) -> jax.Array:
    """Inverse of prepack_tiled -> canonical half-split [K/2, N]."""
    n_n, G, brows, bn = tiled.shape
    p = tiled.transpose(1, 2, 0, 3).reshape(G, brows, n_n * bn)
    q = (p[:, _ROW] >> _SHIFT[None, :, None]) & 0xF  # [G, BK, N]
    K = G * BK
    q = q.reshape(K, n_n * bn)
    qt = q.reshape(K // 256, 2, 128, n_n * bn)
    return (qt[:, 0] | (qt[:, 1] << 4)).reshape(K // 2,
                                                n_n * bn).astype(
                                                    jnp.uint8)


def _decode_group(packed_u8: jax.Array, dtype,
                  interpret: bool) -> jax.Array:
    """[BROWS, bn] packed bytes -> [BK, bn] weights valued 128 + q
    (quad-row interleave; see module docstring trick #3)."""
    if interpret:  # bitcast semantics differ off-TPU; same numerics
        # _ROW/_SHIFT recomputed from iota: pallas kernels cannot
        # capture host constants.
        p = packed_u8.astype(jnp.int32)
        k = jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0)
        sec, r_in = k >> 5, k & 31
        row = 4 * (r_in >> 1) + 2 * (r_in & 1) + (sec >> 1)
        shift = (sec & 1) * 4
        q = (jnp.take(p, row[:, 0], axis=0) >> shift) & 0xF
        return (q.astype(jnp.float32) + 128.0).astype(dtype)
    t = pltpu.bitcast(packed_u8, jnp.int32)  # [BROWS // 4, bn]
    m = jnp.int32(0x000F000F)
    c = jnp.int32(0x43004300)
    w = pltpu.bitcast(
        jnp.concatenate([
            (t & m) | c,
            ((t >> 4) & m) | c,
            ((t >> 8) & m) | c,
            ((t >> 12) & m) | c,
        ], axis=0), jnp.bfloat16)
    return w if dtype == jnp.bfloat16 else w.astype(dtype)


def _kernel(x_ref, qw_ref, s_ref, zb_ref, out_ref, acc_ref, *,
            n_k: int, gsup: int, interpret: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    # One regime for all bt: deferred-scale epilogue — raw levels feed
    # the MXU, scales/zbias apply to the accumulator (docstring #1).
    # (A prefill variant that scaled the WEIGHTS and merged the gsup
    # groups into one fat K=gsup*128 dot was built and measured
    # neutral on v5e — prefill is VPU-dequant-bound, not short-K
    # bound — so the more precise deferred-scale path stays; the
    # remaining prefill lever is fewer dequant VPU ops, not dot shape.)
    acc = jnp.zeros_like(acc_ref)
    for j in range(gsup):
        w = _decode_group(qw_ref[0, j], x.dtype, interpret)
        xg = x[:, j * BK:(j + 1) * BK]
        y = jax.lax.dot_general(xg, w, (((1, ), (0, )), ((), ())),
                                preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[0, j:j + 1].astype(jnp.float32)  # [1, bn]
        if zb_ref is None:
            # Symmetric checkpoint (zeros == 8 => zb = -8*s, detected
            # at prepare_weights): the zbias plane is never stored or
            # streamed. w = 128 + q => x@(q-8) = y - 136*xs.
            acc += (y - 136.0 * xs) * s
        else:
            zb = zb_ref[0, j:j + 1].astype(jnp.float32)
            # w = 128 + q  =>  x@q = y - 128*xs: fold into the zero-bias.
            acc += y * s + xs * (zb - 128.0 * s)
    acc_ref[...] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _kernel_sym(x_ref, qw_ref, s_ref, out_ref, acc_ref, **kw):
    _kernel(x_ref, qw_ref, s_ref, None, out_ref, acc_ref, **kw)


@functools.partial(jax.jit, static_argnames=("interpret", ))
def w4a16_matmul(
    x: jax.Array,  # [T, K] bf16/f32
    qweight: jax.Array,  # [n_n, G, BROWS, bn] prepacked (or [K/2, N])
    scales: jax.Array,  # [K//128, N]
    zbias: jax.Array | None = None,  # [K//128, N]; None => zb = -8*s
    interpret: bool = False,
) -> jax.Array:
    T, K = x.shape
    G = scales.shape[0]
    assert K // G == 128, "kernel requires group_size 128"
    assert K % BK == 0, f"K={K} must be a multiple of {BK}"

    bt = pick_bt(T)
    if qweight.ndim == 2:  # unpacked leaf: tile on the fly (slow path)
        qweight = prepack_tiled(qweight, pick_bn(qweight.shape[1], bt))
    n_n, G2, _, bn = qweight.shape
    assert G2 == G
    N = n_n * bn
    n_t = cdiv(T, bt)
    gsup = pick_gsup(G, bn, bt, n_n)
    n_kg = G // gsup

    # Leading-indexed scale layout: pipeline indexes only the untiled
    # leading dim (Mosaic: sliced tiled dims must be tile-aligned).
    # dtype passes through: prepare_weights ships bf16 scales (halves
    # ~19% of the weight stream); the kernel upcasts in the epilogue.
    s3 = scales.reshape(n_kg, gsup, N)
    sym = zbias is None
    scale_spec = pl.BlockSpec((1, gsup, bn), lambda t, n, k: (k, 0, n),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bt, gsup * BK), lambda t, n, k: (t, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gsup, BROWS, bn),
                     lambda t, n, k: (n, k, 0, 0),
                     memory_space=pltpu.VMEM),
        scale_spec,
    ] + ([] if sym else [scale_spec])
    args = ((_pad_rows(x, n_t * bt), qweight, s3) if sym else
            (_pad_rows(x, n_t * bt), qweight, s3,
             zbias.reshape(n_kg, gsup, N)))
    out = pl.pallas_call(
        functools.partial(_kernel_sym if sym else _kernel, n_k=n_kg,
                          gsup=gsup, interpret=interpret),
        grid=(n_t, n_n, n_kg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k: (t, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_t * bt, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"), ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=K * N // 2 + T * K * 2 + T * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:T]


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, [(0, rows - x.shape[0]), (0, 0)])
