"""Hardware parity for the W4A16 Pallas kernel's magic-mantissa decode.

The compiled (interpret=False) kernel takes a different decode branch
than interpret mode: it relies on Mosaic's bf16/i32 row-interleaved
bitcast layout (pltpu.bitcast: bf16 row 2r == low 16 bits of i32 row r).
Interpret-mode tests cannot validate that assumption, so this file runs
the REAL kernel and compares against the XLA dequant reference.

Skipped off-TPU; run with:

    VLLM_TPU_TEST_ON_TPU=1 python -m pytest tests/quant/test_w4a16_tpu_parity.py

Ref bar: the reference validates marlin the same way — CUDA kernel vs a
torch dequant reference (tests/kernels/quantization marlin tests).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.quant.kernels import quantized_matmul_xla
from vllm_tpu.quant.loader import make_device_leaf
from vllm_tpu.quant.pallas_w4a16 import w4a16_matmul
from vllm_tpu.quant.ref import quantize_groupwise

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="needs a real TPU (VLLM_TPU_TEST_ON_TPU=1)")


def make_leaf(rng, K, N, bits=4, sym=True):
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q, s, z = quantize_groupwise(w, bits, 128, sym)
    leaf_np = make_device_leaf(q, s, z, None, bits)
    return {k: jnp.asarray(v) for k, v in leaf_np.items()}


@requires_tpu
@pytest.mark.parametrize("T,K,N,sym", [(8, 512, 256, True),
                                       (64, 1024, 512, True),
                                       (16, 512, 256, False)])
def test_w4a16_hardware_matches_xla(T, K, N, sym):
    rng = np.random.default_rng(7)
    leaf = make_leaf(rng, K, N, 4, sym)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    # conftest pins matmul precision to "highest" for CPU parity tests;
    # Mosaic cannot compile a HIGHEST-precision bf16 dot — run the
    # kernel at the production default.
    with jax.default_matmul_precision("default"):
        ref = np.asarray(quantized_matmul_xla(x, leaf), np.float32)
        got = np.asarray(
            w4a16_matmul(x, leaf["qweight"], leaf["scales"],
                         leaf["zbias"], interpret=False), np.float32)
    # bf16 accumulate noise only — the decode itself must be exact, so
    # a wrong row-interleave assumption fails by orders of magnitude.
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
    assert np.square(got - ref).mean() < 1e-4 * np.square(ref).mean()


@requires_tpu
@pytest.mark.parametrize("T,K,N,sym", [(32, 512, 256, True),
                                       (256, 1024, 512, False)])
def test_w4a8_tpu_matches_reference(T, K, N, sym):
    """Compiled W4A8 kernel (int8 MXU dots + straight-split nibble
    expansion) vs the explicit int8-activation reference — validates
    the Mosaic u8->i8 bitcast layout and the int32 accumulate path the
    interpret branch cannot."""
    from vllm_tpu.quant.pallas_w4a8 import w4a8_matmul
    rng = np.random.default_rng(7)
    leaf = make_leaf(rng, K, N, 4, sym)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    got = np.asarray(
        w4a8_matmul(x, leaf["qweight"], leaf["scales"],
                    None if sym else leaf["zbias"]), np.float32)
    xf = np.asarray(x, np.float32)
    xs = np.abs(xf).max(axis=1, keepdims=True) / 127.0
    inv = np.where(xs > 0, 1.0 / np.where(xs > 0, xs, 1.0), 0.0)
    xq = np.clip(np.round(xf * inv), -127, 127)
    from vllm_tpu.quant.kernels import dequant_weight_xla
    ref_leaf = dict(leaf)
    if sym:
        ref_leaf.pop("zbias", None)
    w = np.asarray(dequant_weight_xla(ref_leaf, jnp.float32))
    want = (xq @ w) * xs
    denom = np.abs(want).max() or 1.0
    assert np.abs(got - want).max() / denom < 2e-2  # bf16 out rounding
