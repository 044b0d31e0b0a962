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
- Weights are prepacked tile-major per expert [NE, n_n, n_k, HALF, bn]
  (contiguous per-grid-step DMAs).

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

from vllm_tpu.quant.pallas_w4a16 import BK, HALF, pick_bn, prepack_tiled
from vllm_tpu.utils import cdiv


def prepack_tiled_experts(qweight: jax.Array, bn: int) -> jax.Array:
    """[NE, K/2, N] uint8 -> [NE, n_n, n_k, HALF, bn]."""
    return jax.vmap(lambda w: prepack_tiled(w, bn))(qweight)


def _kernel(emap_ref, x_ref, qw_ref, s_ref, zb_ref, out_ref, acc_ref, *,
            n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = qw_ref[0, 0, 0].astype(jnp.int32)  # [HALF, bn]
    lo = (packed & 0xF).astype(x_ref.dtype)
    hi = ((packed >> 4) & 0xF).astype(x_ref.dtype)
    x = x_ref[...]
    x0 = x[:, :HALF]
    x1 = x[:, HALF:]
    y0 = jax.lax.dot_general(x0, lo, (((1, ), (0, )), ((), ())),
                             preferred_element_type=jnp.float32)
    y1 = jax.lax.dot_general(x1, hi, (((1, ), (0, )), ((), ())),
                             preferred_element_type=jnp.float32)
    xs0 = jnp.sum(x0.astype(jnp.float32), axis=1, keepdims=True)
    xs1 = jnp.sum(x1.astype(jnp.float32), axis=1, keepdims=True)
    s = s_ref[0, 0]  # [2, bn]
    zb = zb_ref[0, 0]
    acc_ref[...] += (y0 * s[0:1, :] + xs0 * zb[0:1, :] + y1 * s[1:2, :] +
                     xs1 * zb[1:2, :])

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def moe_w4a16_matmul(
    x: jax.Array,  # [A_pad, K] expert-sorted, tile-aligned padded
    emap: jax.Array,  # [n_tiles] i32 expert id per BT-row tile
    qweight: jax.Array,  # [NE, n_n, n_k, HALF, bn] prepacked
    scales: jax.Array,  # [NE, K//128, N] f32
    zbias: jax.Array,  # [NE, K//128, N] f32
    bt: int,
    interpret: bool = False,
) -> jax.Array:
    A_pad, K = x.shape
    NE, n_n, n_k, _, bn = qweight.shape
    N = n_n * bn
    assert A_pad % bt == 0 and A_pad // bt == emap.shape[0]
    assert K % BK == 0 and K // BK == n_k

    s4 = scales.astype(jnp.float32).reshape(NE, n_k, 2, N)
    zb4 = zbias.astype(jnp.float32).reshape(NE, n_k, 2, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A_pad // bt, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bt, BK), lambda t, n, k, emap: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, HALF, bn),
                         lambda t, n, k, emap: (emap[t], n, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, bn),
                         lambda t, n, k, emap: (emap[t], k, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, bn),
                         lambda t, n, k, emap: (emap[t], k, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k, emap: (t, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
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
