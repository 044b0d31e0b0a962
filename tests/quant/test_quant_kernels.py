"""Quantized matmul kernels: XLA reference vs numpy dequant; Pallas
W4A16 (interpret) vs XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.kernels import (dequant_weight_xla,
                                    quantized_matmul_xla)
from vllm_tpu.quant.loader import make_device_leaf
from vllm_tpu.quant.pallas_w4a16 import w4a16_matmul
from vllm_tpu.quant.ref import dequantize_groupwise, quantize_groupwise


def make_leaf(rng, K, N, bits=4, sym=True):
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q, s, z = quantize_groupwise(w, bits, 128, sym)
    leaf_np = make_device_leaf(q, s, z, None, bits)
    leaf = {k: jnp.asarray(v) for k, v in leaf_np.items()}
    w_ref = dequantize_groupwise(q, s, z, 128)
    return leaf, w_ref


@pytest.mark.parametrize("bits,sym", [(4, True), (4, False), (8, True)])
def test_dequant_weight_matches_numpy(bits, sym):
    rng = np.random.default_rng(0)
    leaf, w_ref = make_leaf(rng, 256, 128, bits, sym)
    w = np.asarray(dequant_weight_xla(leaf, jnp.float32))
    np.testing.assert_allclose(w, w_ref, rtol=2e-3, atol=2e-5)


def test_quantized_matmul_xla_matches_numpy():
    rng = np.random.default_rng(1)
    leaf, w_ref = make_leaf(rng, 512, 128, 4, True)
    x = rng.standard_normal((8, 512)).astype(np.float32)
    got = np.asarray(quantized_matmul_xla(jnp.asarray(x), leaf))
    np.testing.assert_allclose(got, x @ w_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("T,K,N", [(8, 256, 128), (130, 512, 256),
                                   (1, 1024, 384)])
def test_pallas_w4a16_matches_xla(T, K, N):
    rng = np.random.default_rng(2)
    leaf, w_ref = make_leaf(rng, K, N, 4, True)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    ref = np.asarray(quantized_matmul_xla(x, leaf))
    got = np.asarray(
        w4a16_matmul(x, leaf["qweight"], leaf["scales"], leaf["zbias"],
                     interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_pallas_w4a16_asym():
    rng = np.random.default_rng(3)
    leaf, w_ref = make_leaf(rng, 256, 128, 4, sym=False)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    ref = np.asarray(x) @ w_ref
    got = np.asarray(
        w4a16_matmul(x, leaf["qweight"], leaf["scales"], leaf["zbias"],
                     interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_w8a16_path():
    rng = np.random.default_rng(4)
    leaf, w_ref = make_leaf(rng, 256, 64, 8, True)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    got = np.asarray(quantized_matmul_xla(jnp.asarray(x), leaf))
    np.testing.assert_allclose(got, x @ w_ref, rtol=1e-3, atol=1e-3)


def test_desc_act_pallas_path_matches_xla():
    """desc_act leaves now take the fused kernel: gather x by perm,
    then the group-sorted qweight is kernel-ready (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp
    from vllm_tpu.quant.kernels import quantized_matmul_xla
    from vllm_tpu.quant.loader import make_device_leaf
    from vllm_tpu.quant.pallas_w4a16 import w4a16_matmul
    from vllm_tpu.quant.ref import quantize_groupwise

    rng = np.random.default_rng(0)
    K, N, T = 512, 256, 4
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q, s, z = quantize_groupwise(w, 4, 128, sym=True)
    perm = rng.permutation(K).astype(np.int32)
    leaf = {k: jnp.asarray(v) for k, v in
            make_device_leaf(q, s, z, perm, 4).items()}
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))

    ref = quantized_matmul_xla(x, leaf)
    xg = x[:, leaf["perm"]]
    got = w4a16_matmul(xg, leaf["qweight"], leaf["scales"],
                       leaf["zbias"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_w4a16_sym_no_zbias():
    """Symmetric fast path: zbias=None must equal the explicit
    zb = -8*s leaf (the plane prepare_weights drops)."""
    rng = np.random.default_rng(5)
    leaf, w_ref = make_leaf(rng, 256, 128, 4, sym=True)
    assert np.allclose(np.asarray(leaf["zbias"]),
                       -8.0 * np.asarray(leaf["scales"]))
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    ref = np.asarray(
        w4a16_matmul(x, leaf["qweight"], leaf["scales"], leaf["zbias"],
                     interpret=True))
    got = np.asarray(
        w4a16_matmul(x, leaf["qweight"], leaf["scales"], None,
                     interpret=True))
    # (y - 136*xs)*s vs y*s + xs*(zb - 128*s): same math, different
    # f32 rounding order.
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_prepare_weights_drops_sym_zbias(monkeypatch):
    """prepare_weights detects zeros==8 symmetry and deletes the zbias
    plane; the XLA fallback reconstructs it."""
    import vllm_tpu.ops.dispatch as dispatch
    from vllm_tpu.quant.kernels import prepare_weights
    monkeypatch.setattr(dispatch, "attention_backend", lambda: "pallas")
    rng = np.random.default_rng(6)
    sym_leaf, w_sym = make_leaf(rng, 256, 256, 4, sym=True)
    asym_leaf, w_asym = make_leaf(rng, 256, 256, 4, sym=False)
    out = prepare_weights({"a": sym_leaf, "b": asym_leaf})
    assert "zbias" not in out["a"]
    assert "zbias" in out["b"]
    w = np.asarray(dequant_weight_xla(out["a"], jnp.float32))
    np.testing.assert_allclose(w, w_sym, rtol=1e-2, atol=2e-3)
