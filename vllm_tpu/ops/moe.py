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
    w_gate_up,  # [E, H, 2I] array, or WNA16 dict leaf (stacked experts)
    w_down,  # [E, I, H] array, or WNA16 dict leaf
    top_k: int,
    renormalize: bool = True,
    eplb: dict | None = None,
) -> jax.Array:
    from vllm_tpu.ops.linear import linear
    router_logits = linear(router_leaf, x)  # [T, E]
    weights, expert_ids = topk_softmax_routing(router_logits, top_k,
                                               renormalize)
    return apply_experts(x, weights, expert_ids, w_gate_up, w_down,
                         top_k, eplb=eplb)


def apply_experts(
    x: jax.Array,  # [T, H]
    weights: jax.Array,  # [T, K] combine weights (any routing scheme)
    expert_ids: jax.Array,  # [T, K] int32 *logical* expert ids
    w_gate_up,
    w_down,
    top_k: int,
    eplb: dict | None = None,
) -> jax.Array:
    """Expert compute + combine for externally computed routing
    (DeepSeek group-limited / sigmoid gates route here too).

    With an ``eplb`` leaf the stacked weights are *physical* replicas
    and routing translates logical->physical on device; the step's
    logical load streams to the host balancer (parallel/eplb.py)."""
    T, H = x.shape
    A = T * top_k  # total assignments (static)

    if eplb is not None:
        from vllm_tpu.parallel.eplb import (maybe_record_load,
                                            translate_expert_ids)
        maybe_record_load(eplb["layer_idx"], expert_ids,
                          eplb["replica_counts"].shape[0])
        expert_ids = translate_expert_ids(expert_ids, eplb)

    from vllm_tpu.parallel.mesh import AXIS_EP, axis_size
    if axis_size(AXIS_EP) > 1:
        return _ep_moe(x, weights, expert_ids, w_gate_up, w_down, top_k)

    if isinstance(w_gate_up, dict):
        return _quantized_moe(x, weights, expert_ids, w_gate_up, w_down,
                              top_k)

    E = w_gate_up.shape[0]
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


def _ep_moe(x, weights, expert_ids, w_gate_up, w_down,
            top_k: int) -> jax.Array:
    """Expert parallelism: shard the stacked-expert axis over the
    ``ep`` mesh axis (ref analog: EP dispatch/combine all2all,
    vllm/distributed/device_communicators/all2all.py + FusedMoE EP
    slicing). TPU-native formulation: dense dispatch under
    ``shard_map`` manual over ``ep`` only (tp stays GSPMD-auto inside)
    — every rank computes its local experts' contribution for the full
    (replicated) token set, non-local assignments route to a zero
    overflow expert, and one ``psum`` over ``ep`` combines. For
    inference-sized token batches the replicated-token cost is far
    below an a2a's latency on ICI.

    Quantized (WNA16) expert leaves are dequantized locally per rank —
    the tile-major Pallas MoE layout is skipped under EP (see
    quant/kernels.prepare_weights).
    """
    from jax.sharding import PartitionSpec as P
    from vllm_tpu.parallel.mesh import AXIS_EP, get_current_mesh
    mesh = get_current_mesh()
    T, H = x.shape
    A = T * top_k
    quantized = isinstance(w_gate_up, dict)

    def local_fn(x, weights, expert_ids, w_gu, w_dn):
        if quantized:
            from vllm_tpu.quant.kernels import dequant_weight_xla
            dq = jax.vmap(lambda qw, s, zb: dequant_weight_xla(
                {"qweight": qw, "scales": s, "zbias": zb}, x.dtype))
            w_gu = dq(w_gu["qweight"], w_gu["scales"], w_gu["zbias"])
            w_dn = dq(w_dn["qweight"], w_dn["scales"], w_dn["zbias"])
        ep_idx = jax.lax.axis_index(AXIS_EP)
        EL = w_gu.shape[0]  # experts per rank
        lo = ep_idx * EL
        gu_pad = jnp.concatenate(
            [w_gu, jnp.zeros_like(w_gu[:1])], 0).astype(x.dtype)
        dn_pad = jnp.concatenate(
            [w_dn, jnp.zeros_like(w_dn[:1])], 0).astype(x.dtype)

        def compute(xs_u, weights_u, ids_u):
            Tu = xs_u.shape[0]
            Au = Tu * top_k
            flat = ids_u.reshape(Au)
            local = (flat >= lo) & (flat < lo + EL)
            eloc = jnp.where(local, flat - lo, EL)  # EL = overflow
            order = jnp.argsort(eloc, stable=True)
            token_of = order // top_k
            group_sizes = jnp.bincount(eloc, length=EL + 1)
            h = jax.lax.ragged_dot(xs_u[token_of], gu_pad, group_sizes)
            h = silu_and_mul(h)
            out = jax.lax.ragged_dot(h, dn_pad, group_sizes)
            w_flat = jnp.where(local, weights_u.reshape(Au),
                               0.0)[order].astype(out.dtype)
            out = out * w_flat[:, None]
            return jnp.zeros((Tu, H), out.dtype).at[token_of].add(out)

        # psum in f32: exact accumulation across ranks, and it dodges
        # an XLA:CPU AllReducePromotion crash on bf16 all-reduce.
        def combine(res):
            return jax.lax.psum(res.astype(jnp.float32),
                                AXIS_EP).astype(res.dtype)

        from vllm_tpu import envs
        if not envs.VLLM_TPU_MOE_DBO or T < 2:
            return combine(compute(x, weights, expert_ids))
        # Dual-batch overlap (ref analog: vllm/v1/worker/ubatching.py
        # + docs/design/dbo.md): split the tokens into two
        # micro-batches whose expert GEMMs and combine collectives
        # have NO cross dependence — ubatch A's psum is in flight on
        # the ICI while ubatch B's experts run on the MXU. The
        # reference builds this interleave with paired GPU streams;
        # under XLA it is pure dataflow + the async collective
        # scheduler (the all-reduce lowers to an async start/done
        # pair that the latency-hiding scheduler slides across B's
        # compute).
        Ta = T // 2
        res_a = compute(x[:Ta], weights[:Ta], expert_ids[:Ta])
        sum_a = combine(res_a)
        res_b = compute(x[Ta:], weights[Ta:], expert_ids[Ta:])
        sum_b = combine(res_b)
        return jnp.concatenate([sum_a, sum_b], axis=0)

    fn = jax.shard_map(
        local_fn, mesh=mesh, axis_names=frozenset({AXIS_EP}),
        in_specs=(P(), P(), P(), P(AXIS_EP), P(AXIS_EP)),
        out_specs=P())
    return fn(x, weights, expert_ids, w_gate_up, w_down)


def _quantized_moe(x, weights, expert_ids, gu_leaf: dict, dn_leaf: dict,
                   top_k: int) -> jax.Array:
    """WNA16 expert path (ref analog: moe_wna16.cu grouped GEMM +
    WNA16MoE oracle, auto_gptq.py:73 get_moe_quant_method).

    Pallas backend: tile-aligned expert-sorted layout feeds the grouped
    dequant-GEMM (quant/pallas_moe.py). XLA fallback: dequantize the
    stacked experts and reuse ragged_dot (ground truth / CPU path).
    """
    from vllm_tpu.ops.dispatch import attention_backend
    T, H = x.shape
    A = T * top_k
    NE = gu_leaf["scales"].shape[0]

    use_pallas = (attention_backend() == "pallas"
                  and gu_leaf["qweight"].dtype == jnp.uint8
                  and gu_leaf["qweight"].ndim == 5)
    if not use_pallas:
        from vllm_tpu.quant.kernels import dequant_weight_xla
        dq = jax.vmap(lambda qw, s, zb: dequant_weight_xla(
            {"qweight": qw, "scales": s, "zbias": zb}, x.dtype))
        w_gate_up = dq(gu_leaf["qweight"], gu_leaf["scales"],
                       gu_leaf["zbias"])
        w_down = dq(dn_leaf["qweight"], dn_leaf["scales"],
                    dn_leaf["zbias"])
        flat_experts = expert_ids.reshape(A)
        order = jnp.argsort(flat_experts, stable=True)
        token_of = order // top_k
        group_sizes = jnp.bincount(flat_experts, length=NE)
        xs = x[token_of]
        h = jax.lax.ragged_dot(xs, w_gate_up, group_sizes)
        h = silu_and_mul(h)
        out = jax.lax.ragged_dot(h, w_down, group_sizes)
        w_flat = weights.reshape(A)[order].astype(out.dtype)
        out = out * w_flat[:, None]
        return jnp.zeros((T, H), out.dtype).at[token_of].add(out)

    from vllm_tpu.quant.pallas_moe import moe_align, moe_w4a16_matmul
    bt = 16 if A <= 512 else 256
    order, pos, emap, A_pad = moe_align(expert_ids, NE, top_k, bt)
    token_of = order // top_k
    xs_pad = jnp.zeros((A_pad, H), x.dtype).at[pos].set(x[token_of])
    h = moe_w4a16_matmul(xs_pad, emap, gu_leaf["qweight"],
                         gu_leaf["scales"], gu_leaf["zbias"], bt=bt)
    h = silu_and_mul(h)  # [A_pad, I]
    out_pad = moe_w4a16_matmul(h, emap, dn_leaf["qweight"],
                               dn_leaf["scales"], dn_leaf["zbias"],
                               bt=bt)
    out = out_pad[pos]  # [A] sorted-assignment outputs
    w_flat = weights.reshape(A)[order].astype(out.dtype)
    out = out * w_flat[:, None]
    return jnp.zeros((T, H), out.dtype).at[token_of].add(out)
