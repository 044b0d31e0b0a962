"""Batched multi-LoRA apply (the punica SGMV/BGMV analog, TPU-style).

Ref analog: vllm/lora/punica_wrapper/punica_gpu.py — per-row adapter
gather GEMMs. On TPU, adapters are few and tiny, so instead of gather
kernels every adapter's delta is computed with dense matmuls and the
per-row result selected by mask:

    delta = sum_l 1[idx==l] * scale_l * (x @ A_l) @ B_l

Static shapes, XLA-fusable, exact. Cost is L small matmuls
([T, K] @ [K, r] and [T, r] @ [r, N]); at decode T and rank <= 64 the
FLOPs are negligible next to the base projection's weight stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lora_apply(
    x: jax.Array,  # [T, K] layer input
    base_out: jax.Array,  # [T, N] base projection output
    stack: dict,  # {"A": [L+1, K, r], "B": [L+1, r, N], "scale": [L+1]}
    lora_idx: jax.Array,  # [T] int32 adapter slot per token row
) -> jax.Array:
    A, B, scale = stack["A"], stack["B"], stack["scale"]
    Lp1 = A.shape[0]
    # h_all[l] = x @ A_l  -> [L+1, T, r]; skip slot 0 (zeros).
    h_all = jnp.einsum("tk,lkr->ltr", x, A[1:],
                       preferred_element_type=jnp.float32)
    d_all = jnp.einsum("ltr,lrn->ltn", h_all.astype(x.dtype), B[1:],
                       preferred_element_type=jnp.float32)
    d_all = d_all * scale[1:, None, None]
    # Per-row one-hot select over adapters.
    onehot = jax.nn.one_hot(lora_idx - 1, Lp1 - 1, dtype=d_all.dtype,
                            axis=0)  # [L, T]; idx 0 -> all-zero column
    delta = jnp.einsum("lt,ltn->tn", onehot, d_all)
    return base_out + delta.astype(base_out.dtype)
