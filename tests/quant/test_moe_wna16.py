"""Quantized MoE (WNA16 int4 experts): grouped Pallas kernel parity +
online quant + e2e fused_moe_apply.

Ref analog: csrc moe_wna16.cu + tests/kernels/moe — here the grouped
dequant-GEMM (quant/pallas_moe.py) is checked against per-expert XLA
dequant matmuls."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.quant.kernels import dequant_weight_xla
from vllm_tpu.quant.loader import make_device_leaf
from vllm_tpu.quant.pallas_moe import (moe_align, moe_w4a16_matmul,
                                       prepack_tiled_experts)
from vllm_tpu.quant.pallas_w4a16 import pick_bn
from vllm_tpu.quant.ref import quantize_groupwise


def make_expert_leaf(rng, NE, K, N):
    ws, qws, ss, zbs = [], [], [], []
    for _ in range(NE):
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        q, s, z = quantize_groupwise(w, 4, 128, sym=True)
        leaf = make_device_leaf(q, s, z, None, 4)
        qws.append(leaf["qweight"])
        ss.append(leaf["scales"])
        zbs.append(leaf["zbias"])
        ws.append(np.asarray(dequant_weight_xla(
            {k: jnp.asarray(v) for k, v in leaf.items()}, jnp.float32)))
    return {
        "qweight": jnp.asarray(np.stack(qws)),
        "scales": jnp.asarray(np.stack(ss)),
        "zbias": jnp.asarray(np.stack(zbs)),
    }, np.stack(ws)


def test_moe_align_layout():
    ids = jnp.asarray([[0, 2], [2, 1], [2, 2]])  # T=3, top_k=2, A=6
    order, pos, emap, A_pad = moe_align(ids, num_experts=4, top_k=2,
                                        bt=8)
    assert A_pad % 8 == 0
    order, pos, emap = map(np.asarray, (order, pos, emap))
    flat = np.asarray(ids).reshape(-1)
    # every assignment's padded row lies in a tile of its expert
    for j in range(6):
        e = flat[order[j]]
        assert emap[pos[j] // 8] == e, (j, e, pos[j], emap)
    # positions unique
    assert len(set(pos.tolist())) == 6


@pytest.mark.parametrize("NE,K,N,A", [(4, 256, 256, 16), (8, 512, 128, 64)])
def test_grouped_kernel_matches_dequant(NE, K, N, A):
    rng = np.random.default_rng(0)
    leaf, w_ref = make_expert_leaf(rng, NE, K, N)
    bn = pick_bn(N, 32)
    qw5 = prepack_tiled_experts(leaf["qweight"], bn)
    bt = 8
    ids = jnp.asarray(rng.integers(0, NE, (A, 1)))
    order, pos, emap, A_pad = moe_align(ids, NE, 1, bt)
    x = rng.standard_normal((A, K)).astype(np.float32)
    xs_pad = jnp.zeros((A_pad, K), jnp.float32).at[pos].set(
        jnp.asarray(x)[np.asarray(order)])
    out = np.asarray(
        moe_w4a16_matmul(xs_pad, emap, qw5, leaf["scales"],
                         leaf["zbias"], bt=bt, interpret=True))
    # reference: per-assignment dense matmul with its expert's weights
    got = out[np.asarray(pos)]
    flat = np.asarray(ids).reshape(-1)[np.asarray(order)]
    ref = np.einsum("ak,akn->an", x[np.asarray(order)], w_ref[flat])
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_fused_moe_apply_quant_matches_dense():
    """Quantized MoE (XLA fallback path on CPU) vs dense MoE with the
    dequantized weights — identical routing, near-identical output."""
    from vllm_tpu.ops.moe import fused_moe_apply
    rng = np.random.default_rng(1)
    NE, H, I, T, top_k = 4, 256, 512, 12, 2
    gu_leaf, gu_ref = make_expert_leaf(rng, NE, H, 2 * I)
    dn_leaf, dn_ref = make_expert_leaf(rng, NE, I, H)
    router = {"weight": jnp.asarray(
        rng.standard_normal((H, NE)).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    dense = fused_moe_apply(x, router, jnp.asarray(gu_ref),
                            jnp.asarray(dn_ref), top_k)
    quant = fused_moe_apply(x, router, gu_leaf, dn_leaf, top_k)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(dense),
                               rtol=2e-3, atol=2e-3)


def test_online_quant_experts_and_forward():
    """quantize_params_online(int4) quantizes expert stacks and the
    Mixtral forward still runs (XLA fallback path)."""
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models import mixtral
    from vllm_tpu.ops.metadata import AttentionMetadata
    from vllm_tpu.quant.online import quantize_params_online

    mc = ModelConfig(vocab_size=128, hidden_size=256,
                     intermediate_size=256, num_layers=1, num_heads=4,
                     num_kv_heads=2, max_model_len=64, dtype="float32",
                     architecture="MixtralForCausalLM", num_experts=4,
                     num_experts_per_tok=2)
    params = mixtral.random_params(mc, seed=0)
    ref_out = None
    kv = [jnp.zeros((5, 4, 16, 128), jnp.float32)]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([16, 17, 18, 19]),
        block_tables=jnp.asarray([[1, 2, 3, 4]]),
        query_start_loc=jnp.asarray([0, 4]),
        seq_lens=jnp.asarray([4]),
    )
    ids = jnp.asarray([1, 2, 3, 4])
    pos = jnp.asarray([0, 1, 2, 3])
    ref_out, _ = mixtral.forward(params, mc, ids, pos, list(kv), meta,
                                 q_blk=16)
    qparams = quantize_params_online(params, "int4")
    assert isinstance(qparams["layers"][0]["w_gate_up"], dict)
    assert qparams["layers"][0]["w_gate_up"]["qweight"].ndim == 3
    q_out, _ = mixtral.forward(qparams, mc, ids, pos, list(kv), meta,
                               q_blk=16)
    # Quantizing attention can flip top-k routing for boundary tokens,
    # so exact closeness isn't guaranteed — require high correlation.
    a = np.asarray(q_out).ravel()
    b = np.asarray(ref_out).ravel()
    assert np.isfinite(a).all()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98, cos
