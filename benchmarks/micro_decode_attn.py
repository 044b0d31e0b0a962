"""Standalone TPU micro-bench for the fused decode-attention kernel.

Times the per-call latency of decode_paged_attention at the BENCH shape
(R=32 rows, H=32/KH=8 GQA, D=128, block_size=32) across KV modes and
sequence lengths, to localize fixed overhead vs streaming cost.

Usage:  python benchmarks/micro_decode_attn.py [bf16|fp8_pth|int8|...]
"""
from __future__ import annotations

import sys
import tempfile

import jax
import jax.profiler
import jax.numpy as jnp
import numpy as np

from vllm_tpu.ops.kv_cache import make_kv_cache, write_kv_xla
from vllm_tpu.ops.pallas.decode_attention import decode_paged_attention


def device_kernel_us(trace_dir: str, name_frag: str = "decode") -> float:
    """Median device-side duration (us) of kernels matching name_frag
    from a jax.profiler trace dir (wall timing through the axon tunnel
    has a ~28 ms fixed round trip — device traces are the only honest
    measurement here)."""
    import glob
    import gzip
    import json

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    durs = []
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pids = {e["pid"] for e in trace["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
    for e in trace["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") in pids
                and name_frag in e.get("name", "")):
            durs.append(e["dur"])
    durs.sort()
    return durs[len(durs) // 2] if durs else float("nan")


def run(kv_dtype: str, seq_len: int, iters: int = 50) -> float:
    R, H, KH, D, bs = 32, 32, 8, 128, 32
    max_blocks = 32
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
    sl = jnp.full((R,), seq_len, jnp.int32)

    # Pre-fill the cache with real values so dequant work is realistic.
    pk = jnp.asarray(rng.standard_normal((R * seq_len, KH, D)),
                     jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((R * seq_len, KH, D)),
                     jnp.bfloat16)
    slots = np.concatenate([
        (1 + r * max_blocks) * bs + np.arange(seq_len) for r in range(R)])
    kv = jax.jit(write_kv_xla)(kv, pk, pv, jnp.asarray(slots, jnp.int32))

    # Chain q <- f(out) and kv <- updated kv so every iteration is
    # data-dependent: the axon loopback relay coalesces *identical*
    # repeated executions, which silently under-times an unchained
    # dispatch loop (measured 4.8 TB/s on a 64 MB copy — impossible).
    @jax.jit
    def step(q, nk, nv, kv, bt, sl):
        out, kv = decode_paged_attention(q, nk, nv, kv, bt, sl,
                                         sm_scale=D ** -0.5)
        return out, kv, q + out.astype(q.dtype) * jnp.bfloat16(1e-6)

    out, kv, q2 = step(q, nk, nv, kv, bt, sl)
    _ = np.asarray(out[0, 0, :4])
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out, kv, q2 = step(q2, nk, nv, kv, bt, sl)
            _ = np.asarray(out[0, 0, :4])
        return device_kernel_us(td)


def main() -> None:
    modes = sys.argv[1:] or ["bf16", "fp8_pth"]
    print(f"devices: {jax.devices()}")
    for mode in modes:
        for seq in (160, 512, 992):
            us = run(mode, seq)
            # streamed bytes: K+V for seq tokens x KH heads x D
            per_tok = {"bf16": 2, "fp8": 1, "fp8_pth": 1, "int8": 1,
                       "int4": 0.5, "tq4": 0.5, "tq3": 0.5}.get(mode, 2)
            gb = 32 * seq * 8 * 128 * 2 * per_tok / 1e9
            print(f"{mode:8s} seq={seq:5d}: {us:8.1f} us/call  "
                  f"({gb / (us / 1e6):6.1f} GB/s eff)")


if __name__ == "__main__":
    main()
