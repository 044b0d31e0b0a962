"""W4A8 vs W4A16 device time at prefill and decode shapes (8B-class
layer matmuls). Trace-timed like micro_w4a16."""
from __future__ import annotations

import sys
import tempfile

import jax
import jax.numpy as jnp
import jax.profiler
import numpy as np

from benchmarks.micro_decode_attn import device_kernel_us
from benchmarks.micro_w4a16 import SHAPES, leaf_for

ITERS = 16


def run(kind: str, name: str, K: int, N: int, T: int):
    from vllm_tpu.quant.pallas_w4a16 import w4a16_matmul
    from vllm_tpu.quant.pallas_w4a8 import prepack_w4a8, w4a8_matmul
    rng = np.random.default_rng(0)
    leaf = leaf_for(K, N, rng)  # prepacked for w4a16, sym (no zbias)
    if kind == "w4a8":
        from vllm_tpu.quant.pallas_w4a16 import unpack_tiled
        qw = prepack_w4a8(unpack_tiled(leaf["qweight"]),
                          leaf["qweight"].shape[-1])
        fn = lambda x: w4a8_matmul(x, qw, leaf["scales"], None)
    else:
        fn = lambda x: w4a16_matmul(x, leaf["qweight"], leaf["scales"],
                                    None)
    xs = jnp.asarray(rng.standard_normal((ITERS, T, K)), jnp.bfloat16)

    @jax.jit
    def many(xs):
        def body(_, x):
            return None, jnp.sum(fn(x).astype(jnp.float32))

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    jax.block_until_ready(many(xs))
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            jax.block_until_ready(many(xs))
        us = device_kernel_us(td, "matmul")
    flops = 2 * T * N * K
    print(f"{kind:6s} {name:8s} T={T:5d}: {us:8.1f} us/call  "
          f"({flops/us/1e6:6.1f} TFLOP/s)")
    return us


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"devices: {jax.devices()}  T={T}")
    for name, (K, N) in SHAPES.items():
        if name == "lm_head":
            continue
        a16 = run("w4a16", name, K, N, T)
        a8 = run("w4a8", name, K, N, T)
        print(f"  -> w4a8 speedup {a16/a8:.2f}x")


if __name__ == "__main__":
    main()
