"""MX (microscaling) formats: MXFP4 / MXFP8 weight quantization.

Ref analog: the INC scheme family's mx_fp dtypes (SURVEY §2.4; ref
quantization configs expose fp4/fp8 "mx" schemes, csrc mxfp4 kernels —
tests/kernels/quantization/test_rocm_mxfp4.py documents the numerics)
per the OCP Microscaling spec:

- block size 32 along the reduction (K) axis
- shared scale per block: E8M0 (a bare power-of-two exponent byte)
- elements: FP4 E2M1 (±{0, .5, 1, 1.5, 2, 3, 4, 6}) or FP8 E4M3

Leaf formats (dispatch key: ``mx_scale``):
    MXFP4: {"qweight": uint8 [K/2, N] (two E2M1 codes per byte,
            low nibble = even k), "mx_scale": uint8 [K/32, N] E8M0}
    MXFP8: {"qweight": float8_e4m3fn [K, N], "mx_scale": uint8}

Scale exponent convention (OCP): shared_exp = floor(log2(absmax)) -
emax_elem, biased by 127 into the E8M0 byte; dequant multiplies the
decoded element by 2^(byte - 127).

XLA compute path: dequant is a gather from the 16-entry E2M1 codebook
(one hot -> MXU-friendly) times a broadcast power-of-two — XLA fuses it
into the consumer matmul's prologue. A dedicated Pallas kernel can
reuse the W4A16 tile loop later (same nibble layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MX_BLOCK = 32

# E2M1 magnitudes for codes 0..7; bit 3 is the sign.
_E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
_E2M1_FULL = np.concatenate([_E2M1, -_E2M1])  # code 0..15
_E2M1_MAX = 6.0
_E4M3_MAX = 448.0


def _e8m0_encode(absmax: np.ndarray, fmt_max: float) -> np.ndarray:
    """Shared block exponent byte (biased 127).

    ceil(log2(absmax / fmt_max)) — the smallest power-of-two scale
    whose scaled blockmax fits the element format without saturating
    (the OCP floor-of-log2 variant clips the blockmax element by up to
    12%; practical MX implementations avoid that)."""
    safe = np.where(absmax > 0, absmax, 1.0)
    e = np.ceil(np.log2(safe / fmt_max) - 1e-7).astype(np.int32)
    return np.clip(e + 127, 0, 254).astype(np.uint8)


def _e8m0_decode(byte: jax.Array) -> jax.Array:
    return jnp.exp2(byte.astype(jnp.float32) - 127.0)


def _quant_e2m1(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even onto the E2M1 grid; returns codes 0..15."""
    mag = np.abs(x)
    # nearest codebook magnitude (ties to even code, matching the
    # midpoint convention of FP rounding)
    diffs = np.abs(mag[..., None] - _E2M1[None, :])
    code = np.argmin(diffs, axis=-1).astype(np.uint8)
    sign = (x < 0).astype(np.uint8) << 3
    return (code | sign).astype(np.uint8)


def quantize_mxfp4(w: np.ndarray) -> dict:
    """[K, N] float -> MXFP4 leaf."""
    K, N = w.shape
    assert K % MX_BLOCK == 0, f"K={K} not a multiple of {MX_BLOCK}"
    w = w.astype(np.float32)
    blocks = w.reshape(K // MX_BLOCK, MX_BLOCK, N)
    absmax = np.abs(blocks).max(axis=1)  # [K/32, N]
    exp = _e8m0_encode(absmax, _E2M1_MAX)
    scale = np.exp2(exp.astype(np.float32) - 127.0)
    scaled = blocks / scale[:, None, :]
    codes = _quant_e2m1(np.clip(scaled, -_E2M1_MAX, _E2M1_MAX))
    codes = codes.reshape(K, N)
    packed = (codes[0::2] | (codes[1::2] << 4)).astype(np.uint8)
    return {"qweight": jnp.asarray(packed), "mx_scale": jnp.asarray(exp)}


def quantize_mxfp8(w: np.ndarray) -> dict:
    K, N = w.shape
    assert K % MX_BLOCK == 0
    w = w.astype(np.float32)
    blocks = w.reshape(K // MX_BLOCK, MX_BLOCK, N)
    absmax = np.abs(blocks).max(axis=1)
    exp = _e8m0_encode(absmax, _E4M3_MAX)
    scale = np.exp2(exp.astype(np.float32) - 127.0)
    q = (blocks / scale[:, None, :]).reshape(K, N)
    # scaled range is [256, 512) at blockmax; e4m3 saturates at 448
    q = np.clip(q, -_E4M3_MAX, _E4M3_MAX)
    q = np.asarray(jnp.asarray(q).astype(jnp.float8_e4m3fn))
    return {"qweight": jnp.asarray(q), "mx_scale": jnp.asarray(exp)}


def dequant_mxfp(leaf: dict, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Materialize [K, N] (XLA path; fused into consumer by XLA)."""
    qw = leaf["qweight"]
    scale = _e8m0_decode(leaf["mx_scale"])  # [K/32, N]
    if qw.dtype == jnp.uint8:  # MXFP4 nibble-packed
        lo = qw & 0xF
        hi = qw >> 4
        codes = jnp.stack([lo, hi], axis=1).reshape(
            qw.shape[0] * 2, qw.shape[1])
        vals = jnp.asarray(_E2M1_FULL)[codes]
    else:  # MXFP8
        vals = qw.astype(jnp.float32)
    K = vals.shape[0]
    s = jnp.repeat(scale, MX_BLOCK, axis=0)
    return (vals * s).astype(compute_dtype)


def mxfp_matmul(x: jax.Array, leaf: dict) -> jax.Array:
    w = dequant_mxfp(leaf, x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)
