"""Mixture-of-Experts compute: top-k routing + exact grouped GEMM.

TPU-native translation of the reference FusedMoE stack (ref:
vllm/model_executor/layers/fused_moe/ — RoutedExperts:44, modular
prepare/finalize kernels, moe_align_block_size): tokens are sorted by
expert (static-shape argsort — the analog of moe_align_block_size) and
the per-expert FFNs run as one ``jax.lax.ragged_dot`` grouped GEMM per
projection. No token dropping, no capacity factor: exact inference
semantics.

Weights per MoE layer (stacked over experts):
    w_gate_up: [E, H, 2*I]   (gate||up fused, ragged_dot rhs)
    w_down:    [E, I, H]
Router: {"weight": [H, E]} linear leaf (quantizable like any linear).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.ops.layers import silu_and_mul


def topk_softmax_routing(
    router_logits: jax.Array,  # [T, E]
    top_k: int,
    renormalize: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Returns (weights [T, K] f32, expert_ids [T, K] i32).

    Mixtral semantics: softmax over the top-k logits (renormalize=True).
    Ref analog: topk_softmax (csrc moe/topk_softmax) + grouped_topk.
    """
    vals, idx = jax.lax.top_k(router_logits.astype(jnp.float32), top_k)
    if renormalize:
        weights = jax.nn.softmax(vals, axis=-1)
    else:
        weights = jax.nn.softmax(router_logits.astype(jnp.float32),
                                 axis=-1)
        weights = jnp.take_along_axis(weights, idx, axis=-1)
    return weights, idx.astype(jnp.int32)


def fused_moe_apply(
    x: jax.Array,  # [T, H]
    router_leaf: dict,
    w_gate_up: jax.Array,  # [E, H, 2I]
    w_down: jax.Array,  # [E, I, H]
    top_k: int,
    renormalize: bool = True,
) -> jax.Array:
    from vllm_tpu.ops.linear import linear
    T, H = x.shape
    E = w_gate_up.shape[0]
    A = T * top_k  # total assignments (static)

    router_logits = linear(router_leaf, x)  # [T, E]
    weights, expert_ids = topk_softmax_routing(router_logits, top_k,
                                               renormalize)

    # Sort assignments by expert (stable) — static-shape "alignment".
    flat_experts = expert_ids.reshape(A)
    order = jnp.argsort(flat_experts, stable=True)  # [A]
    token_of = order // top_k  # source token per sorted assignment
    group_sizes = jnp.bincount(flat_experts, length=E)

    xs = x[token_of]  # [A, H] gathered in expert order
    h = jax.lax.ragged_dot(xs, w_gate_up.astype(x.dtype), group_sizes)
    h = silu_and_mul(h)  # [A, I]
    out = jax.lax.ragged_dot(h, w_down.astype(x.dtype), group_sizes)

    # Combine: weighted scatter-add back to token rows.
    w_flat = weights.reshape(A)[order].astype(out.dtype)
    out = out * w_flat[:, None]
    return jnp.zeros((T, H), out.dtype).at[token_of].add(out)
