"""Pallas TPU kernel: fused W4A16 group-dequant GEMM (the north-star
kernel, SURVEY.md §7).

HBM traffic per weight element: 0.5 byte (nibbles) + ~4/group_size
bytes of scale/zbias — vs 2 bytes for bf16. Dequant happens on the VPU
between the VMEM load and the MXU dot, hidden behind the weight-stream
DMA in the memory-bound decode regime.

Layout co-design (marlin's core trick, ref analog:
csrc/.../quantization/marlin/ dequant-in-epilogue GEMM + repack):
qweight uses per-256-row *half-split* nibble packing (quant/ref.py):
byte row r of a K-tile holds q[k=r] (low nibble) and q[k=r+128]
(high nibble), so the in-kernel unpack is two mask/shift ops and one
sublane concat; with group_size=128 the low/high halves are exactly
groups 0/1 of the tile, so scale application is two rank-1 broadcasts —
no repeat/relayout anywhere. Scales/zbias ride as [n_k, 2, N] so the
pipeline only indexes their untiled leading dim (Mosaic: sliced tiled
dims must be tile-aligned).

Grid (T_tiles, N_tiles, K_tiles), K innermost; fp32 accumulator scratch
persists across the K dimension (sequential grid), output written on
the last K step. Dequant math runs in f32 (checkpoint scales are f16;
bf16 scale rounding would cost accuracy), weights cast to bf16 only at
the MXU boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.quant.ref import PACK_TILE_K
from vllm_tpu.utils import cdiv

BK = PACK_TILE_K  # 256 input rows per K step (= 2 groups of 128)
HALF = BK // 2


def _kernel(x_ref, qw_ref, s_ref, zb_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic legalizes bit ops/casts on i32 vectors, not i8: widen first.
    packed = qw_ref[...].astype(jnp.int32)  # [HALF, BN]
    lo = (packed & 0xF).astype(jnp.float32)
    hi = ((packed >> 4) & 0xF).astype(jnp.float32)
    s = s_ref[0]  # [2, BN] f32
    zb = zb_ref[0]
    w0 = lo * s[0:1, :] + zb[0:1, :]
    w1 = hi * s[1:2, :] + zb[1:2, :]
    w = jnp.concatenate([w0, w1], axis=0).astype(x_ref.dtype)  # [BK, BN]

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bt", "bn", "interpret"))
def w4a16_matmul(
    x: jax.Array,  # [T, K] bf16/f32
    qweight: jax.Array,  # [K//2, N] uint8 half-split packed
    scales: jax.Array,  # [K//128, N]
    zbias: jax.Array,  # [K//128, N]
    bt: int = 256,
    bn: int = 512,
    interpret: bool = False,
) -> jax.Array:
    T, K = x.shape
    N = qweight.shape[1]
    G = scales.shape[0]
    assert K // G == 128, "kernel requires group_size 128"
    assert K % BK == 0, f"K={K} must be a multiple of {BK}"

    bt = min(bt, max(8, 1 << (T - 1).bit_length()))
    # Widest N tile that divides N (fewer grid steps => less per-step
    # overhead; decode perf is sensitive to grid-step count).
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if cand <= bn * 4 and N % cand == 0:
            bn = cand
            break
    else:
        bn = N
    n_t, n_n, n_k = cdiv(T, bt), N // bn, K // BK

    # Leading-indexed scale layout (see module doc).
    s3 = scales.astype(jnp.float32).reshape(n_k, 2, N)
    zb3 = zbias.astype(jnp.float32).reshape(n_k, 2, N)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(n_t, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bt, BK), lambda t, n, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HALF, bn), lambda t, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bn), lambda t, n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bn), lambda t, n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
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
    )(_pad_rows(x, n_t * bt), qweight, s3, zb3)
    return out[:T]


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, [(0, rows - x.shape[0]), (0, 0)])
