"""Experiment: localize fp8 decode-attention overhead (round 5).

Variants:
  A. baseline (bs=32)
  B. block_size=64 (half the DMA descriptors per token)  -> if much
     faster, the kernel is DMA-issue-bound (scalar core), not VPU.
  C. stubbed e4m3 decode chain (bitcast only, wrong numerics) -> the
     delta vs A is the VPU decode-chain share.
"""
from __future__ import annotations

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

import vllm_tpu.ops.pallas.decode_attention as da
from benchmarks.micro_decode_attn import device_kernel_us
from vllm_tpu.ops.kv_cache import make_kv_cache, write_kv_xla
from vllm_tpu.ops.pallas.decode_attention import decode_paged_attention


def run(kv_dtype: str, seq_len: int, bs: int, iters: int = 50) -> float:
    R, H, KH, D = 32, 32, 8, 128
    max_blocks = (992 + bs - 1) // bs + 1
    num_blocks = R * max_blocks + 1
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((R, H, D)), jnp.bfloat16)
    nk = jnp.asarray(rng.standard_normal((R, KH, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((R, KH, D)), jnp.bfloat16)
    kv = make_kv_cache(num_blocks, bs, KH, D, kv_dtype, "bfloat16")
    bt = np.zeros((R, max_blocks), np.int32)
    for r in range(R):
        bt[r] = 1 + r * max_blocks + np.arange(max_blocks)
    bt = jnp.asarray(bt)
    sl = jnp.full((R, ), seq_len, jnp.int32)
    pk = jnp.asarray(rng.standard_normal((R * seq_len, KH, D)),
                     jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((R * seq_len, KH, D)),
                     jnp.bfloat16)
    slots = np.concatenate([(1 + r * max_blocks) * bs +
                            np.arange(seq_len) for r in range(R)])
    kv = jax.jit(write_kv_xla)(kv, pk, pv, jnp.asarray(slots, jnp.int32))

    @jax.jit
    def step(q, nk, nv, kv, bt, sl):
        out, kv = decode_paged_attention(q, nk, nv, kv, bt, sl,
                                         sm_scale=D**-0.5)
        return out, kv, q + out.astype(q.dtype) * jnp.bfloat16(1e-6)

    out, kv, q2 = step(q, nk, nv, kv, bt, sl)
    _ = np.asarray(out[0, 0, :4])
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out, kv, q2 = step(q2, nk, nv, kv, bt, sl)
            _ = np.asarray(out[0, 0, :4])
        return device_kernel_us(td)


def stub_quad(x, interpret=False):
    t = pltpu.bitcast(pltpu.bitcast(x, jnp.uint8), jnp.int32)
    return pltpu.bitcast(jnp.concatenate([t, t], axis=0), jnp.bfloat16)


def main():
    real_quad = da.e4m3_quad_bf16
    for label, bs, quad in (
        ("A base bs32 ", 32, real_quad),
        ("B bs64      ", 64, real_quad),
        ("C stub bs32 ", 32, stub_quad),
        ("D stub bs64 ", 64, stub_quad),
    ):
        da.e4m3_quad_bf16 = quad
        jax.clear_caches()
        for seq in (160, 992):
            us = run("fp8_pth", seq, bs)
            print(f"{label} seq={seq:4d}: {us:8.1f} us", flush=True)
    da.e4m3_quad_bf16 = real_quad


if __name__ == "__main__":
    main()
