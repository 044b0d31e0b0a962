"""W4A8 (QQQ-class) fused kernel: interpret-mode parity vs an explicit
int8-activation reference, prepack round trip, and dispatch plumbing
(ref analog: csrc/.../cutlass_w4a8 + the QQQ accuracy pin)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.kernels import dequant_weight_xla
from vllm_tpu.quant.loader import make_device_leaf
from vllm_tpu.quant.pallas_w4a8 import (prepack_w4a8, unpack_w4a8,
                                        w4a8_matmul)
from vllm_tpu.quant.ref import quantize_groupwise


def make_leaf(rng, K, N, sym=True):
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q, s, z = quantize_groupwise(w, 4, 128, sym)
    leaf_np = make_device_leaf(q, s, z, None, 4)
    return {k: jnp.asarray(v) for k, v in leaf_np.items()}


def _ref(x, leaf):
    """Explicit W4A8 reference: per-token int8 activations times the
    exactly-dequantized weight."""
    xf = np.asarray(x, np.float32)
    xs = np.abs(xf).max(axis=1, keepdims=True) / 127.0
    inv = np.where(xs > 0, 1.0 / np.where(xs > 0, xs, 1.0), 0.0)
    xq = np.clip(np.round(xf * inv), -127, 127)
    w = np.asarray(dequant_weight_xla(leaf, jnp.float32))
    return (xq @ w) * xs


def test_prepack_roundtrip():
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(0, 256, (256, 384), dtype=np.uint8))
    t = prepack_w4a8(qw, 384)
    assert t.shape == (1, 4, 64, 384)
    np.testing.assert_array_equal(np.asarray(unpack_w4a8(t)),
                                  np.asarray(qw))


@pytest.mark.parametrize("T,K,N,sym", [(8, 256, 128, True),
                                       (130, 512, 256, False),
                                       (1, 256, 384, True)])
def test_w4a8_matches_reference(T, K, N, sym):
    rng = np.random.default_rng(1)
    leaf = make_leaf(rng, K, N, sym)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    got = np.asarray(
        w4a8_matmul(x, leaf["qweight"], leaf["scales"],
                    None if sym else leaf["zbias"], interpret=True))
    want = _ref(x, leaf)
    # int8-activation rounding is the format's error; against the
    # exact int8 reference the kernel is near-exact.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dispatch_and_prepare_weights(monkeypatch):
    import vllm_tpu.ops.dispatch as dispatch
    from vllm_tpu.quant.kernels import prepare_weights, quantized_matmul
    monkeypatch.setattr(dispatch, "attention_backend", lambda: "pallas")
    rng = np.random.default_rng(2)
    leaf = make_leaf(rng, 256, 256, sym=True)
    leaf["a8"] = jnp.zeros((0, ), jnp.int8)
    out = prepare_weights({"l": leaf})["l"]
    assert out["qweight"].ndim == 4
    assert "zbias" not in out  # sym detection applies to a8 leaves too
    # dequant fallback picks the a8 unpacker
    w = np.asarray(dequant_weight_xla(out, jnp.float32))
    w_ref = np.asarray(dequant_weight_xla(leaf, jnp.float32))
    np.testing.assert_allclose(w, w_ref, rtol=1e-2, atol=2e-3)


def test_online_w4a8_marks_leaves():
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models import llama
    from vllm_tpu.quant.online import quantize_params_online
    mc = ModelConfig(vocab_size=128, hidden_size=256,
                     intermediate_size=512, num_layers=1, num_heads=4,
                     num_kv_heads=2, max_model_len=64, dtype="float32")
    params = quantize_params_online(llama.random_params(mc, seed=0),
                                    "w4a8")
    leaf = params["layers"][0]["qkv_proj"]
    assert "a8" in leaf and leaf["qweight"].dtype == jnp.uint8
