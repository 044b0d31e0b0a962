"""Pallas TPU kernel: fused W4A16 group-dequant GEMM (the north-star
kernel, SURVEY.md §7).

HBM traffic per weight element: 0.5 byte (nibbles) + ~4/group_size
bytes of scale/zbias — vs 2 bytes for bf16. The decode regime is
memory-bound, so the kernel is built around the weight stream:

1. **Deferred-scale epilogue** (measured +35% over dequant-in-loop).
   The inner loop converts nibbles to raw levels only (int -> bf16 is
   the single VPU op per element) and feeds them straight to the MXU;
   group scales/zero-biases apply to the *accumulator*:

       y  = sum_g (x_g @ q_g) * s_g  +  rowsum(x_g) * zb_g

   which is exact because s/zb are constant within a group: the fma
   moves from K x N elements to T x N, negligible at decode T.
   (Ref analog: marlin's dequant-in-epilogue, csrc/.../marlin/.)
2. **Tile-major prepacked layout.** qweight is stored
   [n_n, n_k, HALF, bn] so every grid step's weight tile is one
   contiguous 256-512KB HBM read (vs 128 strided rows in the flat
   [K/2, N] layout). Prepack happens once at engine init
   (prepare_weights — the analog of process_weights_after_loading);
   the flat layout remains the canonical checkpoint/leaf format.
3. **Half-split nibble packing** (quant/ref.py): byte row r of a
   K-tile holds q[k=r] (low nibble) and q[k=r+128] (high nibble);
   with group_size=128 the halves are exactly groups 2k/2k+1, so the
   epilogue needs two rank-1 terms per K step and no relayouts.

Grid (T_tiles, N_tiles, K_tiles), K innermost; fp32 accumulator scratch
persists across K (sequential grid), output written on the last K step.
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


def prepack_tiled(qweight: jax.Array, bn: int) -> jax.Array:
    """[K/2, N] uint8 -> [n_n, n_k, HALF, bn] tile-major (contiguous
    per-grid-step reads)."""
    K2, N = qweight.shape
    n_k, n_n = K2 // HALF, N // bn
    return qweight.reshape(n_k, HALF, n_n, bn).transpose(2, 0, 1, 3)


def unpack_tiled(tiled: jax.Array) -> jax.Array:
    """Inverse of prepack_tiled -> [K/2, N]."""
    n_n, n_k, half, bn = tiled.shape
    return tiled.transpose(1, 2, 0, 3).reshape(n_k * half, n_n * bn)


def _kernel(x_ref, qw_ref, s_ref, zb_ref, out_ref, acc_ref, *,
            n_k: int, ksup: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic legalizes bit ops/casts on i32 vectors, not i8: widen
    # first. Raw levels go to the MXU; scales wait for the epilogue.
    # ksup K-tiles per grid step (fatter HBM reads, fewer steps).
    x = x_ref[...]
    acc = jnp.zeros_like(acc_ref)
    for j in range(ksup):
        packed = qw_ref[0, j].astype(jnp.int32)  # [HALF, bn]
        lo = (packed & 0xF).astype(x.dtype)
        # Source bytes are u8: >>4 already clears the high bits, no
        # second mask (the dequant chain is VPU-bound — every op on the
        # [HALF, bn] tile costs ~4% of the kernel).
        hi = (packed >> 4).astype(x.dtype)
        x0 = x[:, j * BK:j * BK + HALF]
        x1 = x[:, j * BK + HALF:(j + 1) * BK]
        y0 = jax.lax.dot_general(x0, lo, (((1, ), (0, )), ((), ())),
                                 preferred_element_type=jnp.float32)
        y1 = jax.lax.dot_general(x1, hi, (((1, ), (0, )), ((), ())),
                                 preferred_element_type=jnp.float32)
        xs0 = jnp.sum(x0.astype(jnp.float32), axis=1, keepdims=True)
        xs1 = jnp.sum(x1.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[j].astype(jnp.float32)  # [2, bn]
        zb = zb_ref[j].astype(jnp.float32)
        acc += (y0 * s[0:1, :] + xs0 * zb[0:1, :] + y1 * s[1:2, :] +
                xs1 * zb[1:2, :])
    acc_ref[...] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", ))
def w4a16_matmul(
    x: jax.Array,  # [T, K] bf16/f32
    qweight: jax.Array,  # [n_n, n_k, HALF, bn] prepacked (or [K/2, N])
    scales: jax.Array,  # [K//128, N]
    zbias: jax.Array,  # [K//128, N]
    interpret: bool = False,
) -> jax.Array:
    T, K = x.shape
    G = scales.shape[0]
    assert K // G == 128, "kernel requires group_size 128"
    assert K % BK == 0, f"K={K} must be a multiple of {BK}"

    bt = pick_bt(T)
    if qweight.ndim == 2:  # unpacked leaf: tile on the fly (slow path)
        qweight = prepack_tiled(qweight, pick_bn(qweight.shape[1], bt))
    n_n, n_k, _, bn = qweight.shape
    N = n_n * bn
    n_t = cdiv(T, bt)
    # K-supersteps: process 2 K-tiles (512 rows) per grid step when
    # they divide — halves grid-step count and doubles the per-step
    # weight DMA. Decode shapes only: at prefill bt the doubled
    # weight/scale blocks push past the 16M scoped-VMEM budget.
    ksup = 2 if n_k % 2 == 0 and bt <= 64 else 1
    n_kg = n_k // ksup

    # Leading-indexed scale layout: pipeline indexes only the untiled
    # leading dim (Mosaic: sliced tiled dims must be tile-aligned).
    # dtype passes through: prepare_weights ships bf16 scales (halves
    # ~19% of the weight stream); the kernel upcasts in the epilogue.
    s3 = scales.reshape(n_k, 2, N)
    zb3 = zbias.reshape(n_k, 2, N)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_kg, ksup=ksup),
        grid=(n_t, n_n, n_kg),
        in_specs=[
            pl.BlockSpec((bt, ksup * BK), lambda t, n, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksup, HALF, bn),
                         lambda t, n, k: (n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksup, 2, bn), lambda t, n, k: (k, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ksup, 2, bn), lambda t, n, k: (k, 0, n),
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
