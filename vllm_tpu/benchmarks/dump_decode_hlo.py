"""Dump the compiled (TPU) HLO of the bench decode-loop program and
summarize the copy/fusion ops XLA inserted — the tool behind chasing
the ~0.5 ms/step of `copy-done` the profiler shows inside the decode
while-loop (VERDICT r2 weak #1).

Lowers with abstract (ShapeDtypeStruct) inputs: nothing is uploaded,
but compilation still happens on the real TPU toolchain.

Run: python -m vllm_tpu.benchmarks.dump_decode_hlo [out.txt]
"""

from __future__ import annotations

import functools
import re
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.ops.kv_cache import make_kv_cache
    from vllm_tpu.sample.sampler import SamplingMetadata
    from vllm_tpu.worker.runner import DecodeLoopInputs, _decode_loop_impl

    mc = ModelConfig(vocab_size=32000, hidden_size=4096,
                     intermediate_size=14336, num_layers=32,
                     num_heads=32, num_kv_heads=8, max_model_len=1024,
                     dtype="bfloat16")
    R, num_blocks, block_size = 32, 257, 32
    model = get_model(mc.architecture)

    E, I = mc.hidden_size, mc.intermediate_size
    H, KH, D = mc.num_heads, mc.num_kv_heads, mc.head_dim

    def qleaf(K, N):
        # Abstract leaves in the POST-prepare_weights layout
        # (tile-major qweight + bf16 scales, quant/kernels.py).
        from vllm_tpu.quant.pallas_w4a16 import BROWS, pick_bn
        bn = pick_bn(N, 32)
        sd = jax.ShapeDtypeStruct
        if N % bn:
            raise ValueError(f"N={N} not divisible by bn={bn}")
        return {
            "qweight": sd((N // bn, K // 128, BROWS, bn), jnp.uint8),
            "scales": sd((K // 128, N), jnp.bfloat16),
            "zbias": sd((K // 128, N), jnp.bfloat16),
        }

    sd = jax.ShapeDtypeStruct
    layers = [{
        "input_layernorm": sd((E, ), jnp.bfloat16),
        "qkv_proj": qleaf(E, (H + 2 * KH) * D),
        "o_proj": qleaf(H * D, E),
        "post_attention_layernorm": sd((E, ), jnp.bfloat16),
        "gate_up_proj": qleaf(E, 2 * I),
        "down_proj": qleaf(I, E),
    } for _ in range(mc.num_layers)]
    params = {
        "embed_tokens": {"weight": sd((mc.vocab_size, E), jnp.bfloat16)},
        "layers": layers,
        "norm": sd((E, ), jnp.bfloat16),
        "lm_head": qleaf(E, mc.vocab_size),
    }

    kv_shape = jax.eval_shape(
        lambda: make_kv_cache(num_blocks, block_size, KH, D, "auto",
                              mc.dtype))
    kv_caches = [kv_shape for _ in range(mc.num_layers)]

    dec = DecodeLoopInputs(
        cur_tokens=sd((R, ), jnp.int32),
        positions=sd((R, ), jnp.int32),
        block_tables=sd((R, num_blocks // R + 2), jnp.int32),
        active=sd((R, ), jnp.bool_),
        sampling=SamplingMetadata(
            temperature=sd((R, ), jnp.float32),
            top_k=sd((R, ), jnp.int32),
            top_p=sd((R, ), jnp.float32),
            min_p=sd((R, ), jnp.float32),
            seeds=sd((R, ), jnp.uint32),
            steps=sd((R, ), jnp.int32),
        ),
        lora_idx=None,
        mrope_delta=None,
    )

    fn = jax.jit(
        functools.partial(_decode_loop_impl, model, mc, block_size),
        donate_argnums=(1, ),
        static_argnums=(3, ),
    )
    lowered = fn.lower(params, kv_caches, dec, 64)
    print("lowered; compiling...", file=sys.stderr)
    import json as _json
    import os
    opts = _json.loads(os.environ.get("VLLM_TPU_XLA_OPTS", "{}"))
    compiled = lowered.compile(compiler_options=opts or None)
    txt = compiled.as_text()
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_hlo.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}", file=sys.stderr)

    # Summary: copies and their shapes inside the while body.
    sizes = {}
    for m in re.finditer(r"(copy(?:-start)?)[.\d]*\s*=\s*(\S+?)\[([\d,]*)\]",
                         txt):
        kind, dtype, dims = m.groups()
        shape = tuple(int(x) for x in dims.split(",") if x)
        bits = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "f16": 2}.get(dtype.split("[")[0], 2)
        n = int(np.prod(shape)) if shape else 1
        key = (dtype, shape)
        sizes[key] = sizes.get(key, 0) + 1
    big = sorted(((np.prod(s) if s else 1, d, s, c)
                  for (d, s), c in sizes.items()), reverse=True)
    print("top copies by element count:")
    for n, d, s, c in big[:20]:
        print(f"  x{c:4d}  {d}{list(s)}")


if __name__ == "__main__":
    main()
