"""Standalone TPU micro-bench for the fused W4A16 dequant-GEMM.

Times the per-call DEVICE duration of w4a16_matmul at the BENCH decode
shape (T=32 rows) for each of the four 8B-class layer matmul shapes,
from a jax.profiler trace (wall timing through the axon tunnel carries
a ~28 ms fixed round trip; the loopback relay also coalesces identical
dispatches, so the calls run inside one lax.scan over distinct inputs).

Usage: python benchmarks/micro_w4a16.py [T]
"""
from __future__ import annotations

import sys
import tempfile

import jax
import jax.numpy as jnp
import jax.profiler
import numpy as np

from benchmarks.micro_decode_attn import device_kernel_us

E, I, H, KH, D = 4096, 14336, 32, 8, 128
SHAPES = {
    "qkv": (E, (H + 2 * KH) * D),
    "o": (H * D, E),
    "gate_up": (E, 2 * I),
    "down": (I, E),
    "lm_head": (E, 16384),  # streamed lm-head chunk shape
}
ITERS = 32


def leaf_for(K: int, N: int, rng):
    from vllm_tpu.quant.kernels import prepare_weights
    s = (rng.random((K // 128, N), dtype=np.float32) + 0.5) * 0.004
    return prepare_weights([{
        "qweight":
        jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8)),
        "scales":
        jnp.asarray(s),
        "zbias":
        jnp.asarray(-8.0 * s),
    }])[0]


def run(name: str, K: int, N: int, T: int, dump_names: bool = False):
    from vllm_tpu.quant.kernels import quantized_matmul
    rng = np.random.default_rng(0)
    leaf = leaf_for(K, N, rng)
    xs = jnp.asarray(rng.standard_normal((ITERS, T, K)), jnp.bfloat16)

    @jax.jit
    def many(xs, leaf):
        def body(_, x):
            y = quantized_matmul(x, leaf)
            return None, jnp.sum(y.astype(jnp.float32))

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    out = many(xs, leaf)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            jax.block_until_ready(many(xs, leaf))
        if dump_names:
            _dump_names(td)
        us = device_kernel_us(td, "w4a16")
    nplanes = 2 if "zbias" in leaf else 1  # bf16 s (+ zb if asym)
    bytes_w = K * N // 2 + (K // 128) * N * 2 * nplanes
    bytes_x = T * K * 2 + T * N * 2
    floor_us = (bytes_w + bytes_x) / 819e9 * 1e6
    print(f"{name:8s} K={K:6d} N={N:6d}: {us:7.1f} us/call  "
          f"floor {floor_us:6.1f}  ({100*floor_us/us:5.1f}% of floor, "
          f"{(bytes_w+bytes_x)/us/1e3:4.0f} GB/s)")
    return us, floor_us


def _dump_names(td: str) -> None:
    import glob
    import gzip
    import json
    from collections import Counter
    paths = glob.glob(f"{td}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pids = {
        e["pid"]
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    c = Counter()
    d = Counter()
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in pids:
            c[e["name"]] += 1
            d[e["name"]] += e["dur"]
    for k, v in d.most_common(12):
        print(f"    {k[:70]:70s} n={c[k]:5d} total={v/1e3:8.2f} ms")


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"devices: {jax.devices()}  T={T}")
    tot = flo = 0.0
    first = True
    for name, (K, N) in SHAPES.items():
        us, f = run(name, K, N, T, dump_names=first)
        first = False
        if name != "lm_head":
            tot += us
            flo += f
    print(f"per-layer total {tot:7.1f} us vs floor {flo:6.1f} "
          f"({100*flo/tot:.1f}%); x32 layers = {tot*32/1e3:.2f} ms")


if __name__ == "__main__":
    main()
