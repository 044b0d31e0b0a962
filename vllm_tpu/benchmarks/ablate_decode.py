"""Decode-step ablation: where does the in-loop time go?

Times, at the bench's 8B-class INT4 bs32 decode shape:
  A. the full multi-step decode program (engine's _decode_loop_impl)
  B. the per-layer W4A16 matmul chain alone (weight stream)
  C. the fused decode attention chain alone
  D. one W4A16 megacall (all 4 leaves of one layer back-to-back x32)

Run on the TPU: python -m vllm_tpu.benchmarks.ablate_decode
Prints ms/step for each; (A - B - C) is the residual scheduling /
fusion overhead the round is chasing (VERDICT r1 item 1).
"""

from __future__ import annotations

import time

import numpy as np


def _time(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def ablate_kv_modes(modes=None, iters=20) -> dict[str, float]:
    """Decode-attention chain (32 fused calls) per KV-cache mode;
    VERDICT r2 item 4's measurement. Returns {mode: ms}."""
    import jax
    import jax.numpy as jnp

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.ops.dispatch import fused_decode_attention
    from vllm_tpu.ops.kv_cache import make_kv_cache

    mc = ModelConfig(vocab_size=32000, hidden_size=4096,
                     intermediate_size=14336, num_layers=32,
                     num_heads=32, num_kv_heads=8, max_model_len=1024,
                     dtype="bfloat16")
    R = 32
    rng = np.random.default_rng(0)
    H, KH, D = mc.num_heads, mc.num_kv_heads, mc.head_dim
    num_blocks = 257
    bt = None
    results: dict[str, float] = {}
    modes = modes or ["auto", "int8", "fp8", "fp8_pth", "int4", "tq4",
                      "tq3"]
    for mode in modes:
        import jax.numpy as jnp
        cache = make_kv_cache(num_blocks, 32, KH, D, mode, "bfloat16")
        bt = jnp.asarray(
            rng.integers(1, num_blocks, (R, 32), dtype=np.int32))
        sl = jnp.full((R, ), 160, jnp.int32)
        q = jnp.asarray(rng.standard_normal((R, H, D)), jnp.bfloat16)
        kv = jnp.asarray(rng.standard_normal((R, KH, D)), jnp.bfloat16)

        @jax.jit
        def attn_chain(q, kv, cache):
            out = q
            for _ in range(mc.num_layers):
                out, cache = fused_decode_attention(
                    out, kv, kv, cache, bt, sl, sm_scale=0.088)
            return out, cache

        ms = _time(attn_chain, q, kv, cache, iters=iters)
        results[mode] = ms
        print(f"attention chain [{mode:8s}]: {ms:6.2f} ms", flush=True)
    return results


def main() -> None:
    import sys

    import jax
    import jax.numpy as jnp

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.quant.kernels import prepare_weights
    from vllm_tpu.quant.loader import make_device_leaf

    if "--kv-modes" in sys.argv:
        i = sys.argv.index("--kv-modes")
        modes = sys.argv[i + 1].split(",") if len(sys.argv) > i + 1 \
            else None
        ablate_kv_modes(modes)
        return

    mc = ModelConfig(vocab_size=32000, hidden_size=4096,
                     intermediate_size=14336, num_layers=32,
                     num_heads=32, num_kv_heads=8, max_model_len=1024,
                     dtype="bfloat16")
    R = 32
    rng = np.random.default_rng(0)
    H, KH, D, E, I = (mc.num_heads, mc.num_kv_heads, mc.head_dim,
                      mc.hidden_size, mc.intermediate_size)

    def qleaf(K, N):
        q = rng.integers(0, 16, (K, N), dtype=np.int32)
        s = (rng.random((K // 128, N), dtype=np.float32) + 0.5) * 0.004
        z = np.full((K // 128, N), 8, np.int32)
        return {k: jnp.asarray(v)
                for k, v in make_device_leaf(q, s, z, None, 4).items()}

    shapes = [(E, (H + 2 * KH) * D), (H * D, E), (E, 2 * I), (I, E)]
    layer = [qleaf(K, N) for K, N in shapes]
    layer = prepare_weights(layer)

    from vllm_tpu.quant.kernels import quantized_matmul

    @jax.jit
    def matmul_chain(x):
        for _ in range(mc.num_layers):
            a = quantized_matmul(x, layer[0])  # qkv
            x2 = a[:, :E]
            b = quantized_matmul(x2, layer[1])  # o
            c = quantized_matmul(b, layer[2])  # gate_up
            x = quantized_matmul(c[:, :I], layer[3])  # down
        return x

    x = jnp.asarray(rng.standard_normal((R, E)), jnp.bfloat16)
    t_mm = _time(matmul_chain, x)

    # Attention chain: 32 fused decode attention calls on a real cache.
    from vllm_tpu.ops.dispatch import fused_decode_attention
    from vllm_tpu.ops.kv_cache import make_kv_cache
    num_blocks = 257
    cache = make_kv_cache(num_blocks, 32, KH, D, "auto", "bfloat16")
    bt = jnp.asarray(
        rng.integers(1, num_blocks, (R, 32), dtype=np.int32))
    sl = jnp.full((R, ), 160, jnp.int32)
    q = jnp.asarray(rng.standard_normal((R, H, D)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((R, KH, D)), jnp.bfloat16)

    @jax.jit
    def attn_chain(q, kv, cache):
        out = q
        for _ in range(mc.num_layers):
            out, cache = fused_decode_attention(
                out, kv, kv, cache, bt, sl, sm_scale=0.088)
        return out, cache

    t_attn = _time(attn_chain, q, kv, cache)

    print(f"matmul chain (32 layers, 4 calls each): {t_mm:.2f} ms")
    print(f"attention chain (32 fused calls):       {t_attn:.2f} ms")
    print(f"sum of parts:                           {t_mm+t_attn:.2f} ms")
    print("compare against bench.py ms/step (tok/s -> 32000/v)")


if __name__ == "__main__":
    main()
