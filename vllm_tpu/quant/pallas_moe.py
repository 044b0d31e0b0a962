"""Pallas TPU kernel: grouped W4A16 dequant-GEMM for MoE experts.

Ref analog: csrc/libtorch_stable/moe/moe_wna16.cu (int4/int8 grouped
MoE GEMM) + fused_moe/oracle/int_wna16.py backend selection. TPU
design:

- Assignments are pre-sorted by expert and padded so every BT-row tile
  belongs to exactly one expert (the moe_align_block_size analog, done
  in plain jnp in ops/moe.py).
- The tile -> expert map rides scalar prefetch; BlockSpec index maps
  read it to pick the expert's weight/scale tiles, so one kernel serves
  every expert with zero host round trips.
- Inner math is the deferred-scale epilogue of quant/pallas_w4a16.py
  (raw nibble levels -> MXU, group scales applied to the accumulator).
- Weights are prepacked tile-major per expert [NE, n_n, G, BROWS, bn]
  (K-pair bytes, magic-mantissa decode — see pallas_w4a16; contiguous
  per-grid-step DMAs).

Grid (n_tiles, n_n, n_k), K innermost with a persistent f32
accumulator. A tile's full K-stripe of its expert's weights streams per
(tile, n) pair; at decode sizes that is a ~1.5x re-read of the expert
weights, at prefill sizes the kernel is MXU-bound and the re-reads
hide behind compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.quant.pallas_w4a16 import (BK, BROWS, _decode_group,
                                          pick_bn, prepack_tiled)
from vllm_tpu.utils import cdiv

GSUP = 2  # quant groups (of 128 K rows) per grid step


def prepack_tiled_experts(qweight: jax.Array, bn: int) -> jax.Array:
    """[NE, K/2, N] uint8 -> [NE, n_n, G, BROWS, bn] (K-pair bytes,
    see pallas_w4a16.prepack_tiled)."""
    return jax.vmap(lambda w: prepack_tiled(w, bn))(qweight)


def _kernel(emap_ref, x_ref, qw_ref, s_ref, zb_ref, out_ref, acc_ref, *,
            n_k: int, interpret: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    acc = jnp.zeros_like(acc_ref)
    for j in range(GSUP):
        # Magic-mantissa decode (pallas_w4a16): w = 128 + q, the +128
        # folds into the zero-bias epilogue term.
        w = _decode_group(qw_ref[0, 0, j], x.dtype, interpret)
        xg = x[:, j * BK:(j + 1) * BK]
        y = jax.lax.dot_general(xg, w, (((1, ), (0, )), ((), ())),
                                preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        s = s_ref[0, 0, j:j + 1]  # [1, bn] f32
        zb = zb_ref[0, 0, j:j + 1]
        acc += y * s + xs * (zb - 128.0 * s)
    acc_ref[...] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def moe_w4a16_matmul(
    x: jax.Array,  # [A_pad, K] expert-sorted, tile-aligned padded
    emap: jax.Array,  # [n_tiles] i32 expert id per BT-row tile
    qweight: jax.Array,  # [NE, n_n, G, BROWS, bn] prepacked
    scales: jax.Array,  # [NE, K//128, N] f32
    zbias: jax.Array,  # [NE, K//128, N] f32
    bt: int,
    interpret: bool = False,
) -> jax.Array:
    A_pad, K = x.shape
    NE, n_n, G, _, bn = qweight.shape
    N = n_n * bn
    n_k = G // GSUP
    assert A_pad % bt == 0 and A_pad // bt == emap.shape[0]
    assert K % (GSUP * BK) == 0 and K // BK == G

    s4 = scales.astype(jnp.float32).reshape(NE, n_k, GSUP, N)
    zb4 = zbias.astype(jnp.float32).reshape(NE, n_k, GSUP, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A_pad // bt, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bt, GSUP * BK), lambda t, n, k, emap: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GSUP, BROWS, bn),
                         lambda t, n, k, emap: (emap[t], n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GSUP, bn),
                         lambda t, n, k, emap: (emap[t], k, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GSUP, bn),
                         lambda t, n, k, emap: (emap[t], k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k, emap: (t, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A_pad, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"), ),
        cost_estimate=pl.CostEstimate(
            flops=2 * A_pad * N * K,
            bytes_accessed=(A_pad // bt) * K * bn // 2 * n_n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(emap, x, qweight, s4, zb4)
    return out


def moe_align(expert_ids: jax.Array, num_experts: int, top_k: int,
              bt: int) -> tuple[jax.Array, jax.Array, jax.Array, int]:
    """The moe_align_block_size analog in plain jnp (static shapes).

    expert_ids [T, K] -> (order [A], pos [A], emap [n_tiles], A_pad):
    sorted assignment j (= order[j]-th flat assignment) lands at padded
    row pos[j]; tile i of the padded layout belongs to expert emap[i].
    Padding rows stay zero and their outputs are never gathered.
    """
    A = expert_ids.size
    flat = expert_ids.reshape(A)
    order = jnp.argsort(flat, stable=True)
    sorted_e = flat[order]
    counts = jnp.bincount(flat, length=num_experts)
    padded = cdiv(counts, bt) * bt
    pad_off = jnp.concatenate(
        [jnp.zeros((1, ), counts.dtype),
         jnp.cumsum(padded)])  # [NE+1]
    group_start = jnp.concatenate(
        [jnp.zeros((1, ), counts.dtype),
         jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(A, dtype=jnp.int32) - group_start[sorted_e]
    pos = (pad_off[sorted_e] + rank).astype(jnp.int32)
    A_pad = ((A + num_experts * bt) // bt) * bt  # static upper bound
    n_tiles = A_pad // bt
    tile_rows = jnp.arange(n_tiles, dtype=jnp.int32) * bt
    emap = (jnp.searchsorted(pad_off[1:], tile_rows, side="right")
            .astype(jnp.int32))
    emap = jnp.minimum(emap, num_experts - 1)
    return order, pos, emap, A_pad
