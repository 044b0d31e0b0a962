"""Quantization format/packing unit tests (device-free numpy).

Ref analog: tests/quantization + kernel reference quantizers
(marlin_utils_test.py) in the reference.
"""

import numpy as np
import pytest

from vllm_tpu.quant.formats import (decode_awq, decode_gptq, encode_awq,
                                    encode_gptq)
from vllm_tpu.quant.ref import (dequantize_groupwise, pack_w4_halfsplit,
                                quantize_groupwise, unpack_w4_halfsplit)


@pytest.mark.parametrize("bits,sym", [(4, True), (4, False), (8, True),
                                      (8, False)])
def test_quantize_dequantize_roundtrip_error(bits, sym):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 256)).astype(np.float32)
    q, s, z = quantize_groupwise(w, bits, 128, sym)
    wd = dequantize_groupwise(q, s, z, 128)
    # Max error bounded by half a quant step per group.
    step = s.repeat(128, axis=0)
    assert np.all(np.abs(wd - w) <= step * 0.5 + 1e-6)
    assert q.min() >= 0 and q.max() < (1 << bits)


def test_w4_halfsplit_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 16, (512, 96), dtype=np.int32)
    packed = pack_w4_halfsplit(q)
    assert packed.shape == (256, 96) and packed.dtype == np.uint8
    back = unpack_w4_halfsplit(packed)
    np.testing.assert_array_equal(back, q)


@pytest.mark.parametrize("bits", [4, 8])
def test_gptq_encode_decode_roundtrip(bits):
    rng = np.random.default_rng(2)
    K, N, g = 256, 64, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    q, s, z = quantize_groupwise(w, bits, g, sym=False)
    ckpt = encode_gptq(q, s, z, bits)
    q2, s2, z2, perm = decode_gptq(ckpt["qweight"], ckpt["qzeros"],
                                   ckpt["scales"], ckpt["g_idx"], bits)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_allclose(s2, s, rtol=1e-3)
    assert perm is None  # trivial g_idx


def test_gptq_desc_act_perm():
    rng = np.random.default_rng(3)
    K, N, g, bits = 256, 32, 128, 4
    w = rng.standard_normal((K, N)).astype(np.float32)
    q, s, z = quantize_groupwise(w, bits, g, sym=True)
    ckpt = encode_gptq(q, s, z, bits)
    # Scramble rows as desc_act would: g_idx maps row -> group.
    rperm = rng.permutation(K)
    ckpt_scrambled = dict(ckpt)
    # Rows of qweight get reordered in the quantized domain: simulate a
    # checkpoint whose storage order is rperm with matching g_idx.
    from vllm_tpu.quant.formats import _unpack_int32_rows
    qv = _unpack_int32_rows(ckpt["qweight"], bits)
    qv_s = qv[rperm]
    g_idx_s = (rperm // g).astype(np.int32)
    reenc = encode_gptq(qv_s, s, z, bits)
    q2, s2, z2, perm = decode_gptq(reenc["qweight"], reenc["qzeros"],
                                   reenc["scales"], g_idx_s, bits)
    assert perm is not None
    # After applying perm, rows must be grouped: g_idx sorted.
    np.testing.assert_array_equal(np.sort(g_idx_s), g_idx_s[perm])
    # And dequant with group-major scales reproduces the original w
    # up to quant error: row at sorted position i is original row
    # rperm[perm[i]].
    wd = dequantize_groupwise(q2, s2, z2, g)
    orig_rows = rperm[perm]
    ref = dequantize_groupwise(qv, s, z, g)[orig_rows]
    # scales round-trip through f16 in the checkpoint container
    np.testing.assert_allclose(wd, ref, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("bits", [4, 8])
def test_awq_encode_decode_roundtrip(bits):
    rng = np.random.default_rng(4)
    K, N, g = 128, 64, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    q, s, z = quantize_groupwise(w, bits, g, sym=False)
    ckpt = encode_awq(q, s, z, bits)
    q2, s2, z2 = decode_awq(ckpt["qweight"], ckpt["qzeros"],
                            ckpt["scales"], bits)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_allclose(s2, s, rtol=1e-3)
