"""Fused W4A16 MLP megakernel (quant/pallas_mlp.py) vs the dequant
reference: gate_up GEMM + SiLU*mul + down GEMM in one pallas_call."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.quant.loader import make_device_leaf
from vllm_tpu.quant.pallas_mlp import mlp_supported, mlp_w4a16
from vllm_tpu.quant.pallas_w4a16 import prepack_tiled
from vllm_tpu.quant.ref import dequantize_groupwise, quantize_groupwise

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="needs a real TPU (VLLM_TPU_TEST_ON_TPU=1)")


def make_leaf(rng, K, N, bn):
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q, s, z = quantize_groupwise(w, 4, 128, True)
    leaf_np = make_device_leaf(q, s, z, None, 4)
    leaf = {k: jnp.asarray(v) for k, v in leaf_np.items()}
    leaf["qweight"] = prepack_tiled(leaf["qweight"], bn)
    w_ref = dequantize_groupwise(q, s, z, 128)
    return leaf, w_ref


def ref_mlp(x, w_gu, w_dn, I):
    h = x @ w_gu
    g, u = h[:, :I], h[:, I:]
    act = (g * (1.0 / (1.0 + np.exp(-g)))) * u
    return act @ w_dn


@pytest.mark.parametrize("T,E,I", [(8, 256, 1024), (40, 512, 512)])
def test_mlp_megakernel_interpret(T, E, I):
    rng = np.random.default_rng(5)
    gu, w_gu = make_leaf(rng, E, 2 * I, bn=512)
    dn, w_dn = make_leaf(rng, I, E, bn=min(E, 4096))
    assert mlp_supported(gu, dn, E)
    x = jnp.asarray(rng.standard_normal((T, E)) * 0.3, jnp.float32)
    got = np.asarray(
        mlp_w4a16(x, gu["qweight"], gu["scales"], gu["zbias"],
                  dn["qweight"], dn["scales"], dn["zbias"],
                  interpret=True))
    ref = ref_mlp(np.asarray(x, np.float32), w_gu, w_dn, I)
    np.testing.assert_allclose(got, ref, rtol=4e-2, atol=4e-2)
    assert np.square(got - ref).mean() <= 1e-4 * max(
        np.square(ref).mean(), 1e-6)


def test_mlp_supported_gates():
    rng = np.random.default_rng(6)
    E, I = 256, 1024
    gu, _ = make_leaf(rng, E, 2 * I, bn=512)
    dn, _ = make_leaf(rng, I, E, bn=256)
    assert mlp_supported(gu, dn, E)
    assert not mlp_supported({**gu, "perm": jnp.arange(E)}, dn, E)
    # bn not dividing I (misaligned gate/up columns)
    gu_bad, _ = make_leaf(rng, E, 2 * I, bn=2048)  # one tile of 2I
    assert not mlp_supported(gu_bad, dn, E)


@requires_tpu
def test_mlp_megakernel_hardware():
    rng = np.random.default_rng(7)
    E, I, T = 512, 2048, 32
    gu, w_gu = make_leaf(rng, E, 2 * I, bn=512)
    dn, w_dn = make_leaf(rng, I, E, bn=512)
    x = jnp.asarray(rng.standard_normal((T, E)) * 0.3, jnp.bfloat16)
    with jax.default_matmul_precision("default"):
        got = np.asarray(
            mlp_w4a16(x, gu["qweight"], gu["scales"], gu["zbias"],
                      dn["qweight"], dn["scales"], dn["zbias"]),
            np.float32)
    ref = ref_mlp(np.asarray(x, np.float32), w_gu, w_dn, I)
    assert np.square(got - ref).mean() <= 3e-3 * np.square(ref).mean()
