"""Pallas TPU kernel: weight-streaming dense matmul for small-batch
(decode) shapes.

XLA's dense bf16 matmul at decode batch sizes (T<=64) reaches only
~25-30% of HBM bandwidth on v5e (measured ~236 GB/s); the same tiled
weight-stream structure as the W4A16 kernel (quant/pallas_w4a16.py)
sustains ~670 GB/s. This kernel is that structure minus the dequant:
grid (T, N, K) with K innermost, fp32 accumulator scratch, weights
streamed tile-by-tile.

Used by ops/linear.py for dense layers when the leading dim is small
(decode steps); prefill shapes stay on XLA's MXU-tuned matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.utils import cdiv

BK = 512


def _kernel(x_ref, w_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _pick_bn(N: int, cap: int = 4096) -> int:
    """Largest lane-aligned N tile <= cap that divides N (vocab-sized
    N like 32000 has no power-of-two divisor above 256)."""
    best = 0
    for d in range(1, N // 128 + 1):
        bn = 128 * d
        if N % bn == 0 and bn <= cap:
            best = bn
    return best or N


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def decode_matmul(
    x: jax.Array,  # [T, K] (T small)
    w: jax.Array,  # [K, N]
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    T, K = x.shape
    N = w.shape[1]
    out_dtype = out_dtype or x.dtype
    bt = max(8, 1 << (T - 1).bit_length())
    bk = BK if K % BK == 0 else K
    bn = _pick_bn(N)
    n_t, n_n, n_k = cdiv(T, bt), N // bn, K // bk

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(n_t, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bt, bk), lambda t, n, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda t, n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k: (t, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_t * bt, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"), ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=K * N * w.dtype.itemsize + T * K * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(_pad_rows(x, n_t * bt), w)
    return out[:T]


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, [(0, rows - x.shape[0]), (0, 0)])
