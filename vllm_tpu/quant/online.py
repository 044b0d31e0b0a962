"""Online quantization: transform a dense (bf16/f32) param pytree at
load time — no pre-quantized checkpoint needed.

Ref analog: vllm/model_executor/layers/quantization/online/
({base,fp8,int8}.py — "quantize FP16/BF16 weights at load time",
online/base.py:80-81) with the shorthand method names registered in
quantization/__init__.py:38-47.

Methods:
- ``int4``      weight-only group-128 int4 (W4A16) -> the fused Pallas
                dequant-GEMM path (same leaf format as GPTQ loads)
- ``int8``      weight-only per-channel int8 (W8A16)
- ``w8a8_int8`` per-channel int8 weights + dynamic per-token int8
                activations; int8xint8 MXU dot accumulating s32
- ``fp8``       per-channel e4m3 weights + dynamic per-token e4m3
                activations

Leaf formats extend quant/kernels.py:
- W8A16: {"qweight" int8 [K,N], "scales" f32 [1,N], "zbias" f32 [1,N]}
- W8A8:  {"qweight" int8 [K,N], "wscale" f32 [1,N]}
- FP8:   {"qweight" e4m3 [K,N], "wscale" f32 [1,N]}
(presence of "wscale" == dynamic activation quantization)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_LINEAR_LEAVES = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")


def _quant_weight_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8. w: [K, N]."""
    absmax = np.abs(w).max(axis=0, keepdims=True)  # [1, N]
    scale = np.where(absmax == 0, 1.0, absmax / 127.0)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _quant_weight_fp8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-channel e4m3 (max 448)."""
    absmax = np.abs(w).max(axis=0, keepdims=True)
    scale = np.where(absmax == 0, 1.0, absmax / 448.0)
    q = (w / scale).astype(jnp.float8_e4m3fn)
    return q, scale.astype(np.float32)


def _quant_weight_low_bit(w: np.ndarray, bits: int,
                          group: int = 64, hessian=None) -> dict:
    """Asymmetric {2,3}-bit group quant, densely packed.

    Ref analog: the reference's INC low-bit WNA16 path
    (vllm/model_executor/layers/quantization/inc/, bits {2,3}).
    Packing is byte-granular and TPU-friendly: 2-bit packs 4 values
    per byte ([K/4, N]); 3-bit packs 8 values into 3 bytes
    ([3K/8, N]) — denser than nibble storage, unpacked with a handful
    of vectorized shifts (quant/kernels.py unpack_w2/unpack_w3).
    Leaf contract matches W4A16: w ~= q * scale + zbias with unsigned
    levels; a zero-byte ``bits`` marker array (shape [bits, 0])
    selects the unpacker without any non-array pytree metadata."""
    K, N = w.shape
    assert K % group == 0 and K % 8 == 0
    L = (1 << bits) - 1
    if hessian is not None:
        # INC tier: GPTQ-class error-compensated rounding + MSE clip
        # (quant/error_comp.py) — what makes 2/3-bit usable.
        from vllm_tpu.quant.error_comp import quantize_groupwise_ec
        q, scale, mn = quantize_groupwise_ec(w, bits, group, hessian)
    else:
        wg = w.reshape(K // group, group, N)
        mn = wg.min(axis=1)
        mx = wg.max(axis=1)
        scale = np.where(mx > mn, (mx - mn) / L, 1.0).astype(np.float32)
        q = np.clip(np.rint((wg - mn[:, None]) / scale[:, None]), 0,
                    L).astype(np.uint8).reshape(K, N)
    if bits == 2:
        q4 = q.reshape(K // 4, 4, N)
        packed = (q4[:, 0] | (q4[:, 1] << 2) | (q4[:, 2] << 4)
                  | (q4[:, 3] << 6)).astype(np.uint8)
    else:  # 3-bit: 8 values -> 3 bytes
        q8 = q.reshape(K // 8, 8, N).astype(np.uint16)
        word = np.zeros((K // 8, N), np.uint32)
        for j in range(8):
            word |= q8[:, j].astype(np.uint32) << (3 * j)
        packed = np.stack([(word >> (8 * b)) & 0xFF for b in range(3)],
                          axis=1).astype(np.uint8).reshape(3 * K // 8, N)
    return {
        "qweight": jnp.asarray(packed),
        "scales": jnp.asarray(scale),
        "zbias": jnp.asarray(mn.astype(np.float32)),
        "bits": jnp.zeros((bits, 0), jnp.uint8),
    }


# bitsandbytes NF4 codebook: the 16 "normal-float" levels (zero-
# centered quantiles of N(0,1), normalized to [-1, 1]) — ref analog:
# the bnb 4-bit path (vllm/model_executor/layers/quantization/
# bitsandbytes.py); here as an ONLINE weight format over per-block
# absmax scaling, served via the same codebook-dequant machinery as
# the tq KV formats.
NF4_LEVELS = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534,
    0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
], np.float32)


def _quant_weight_nf4(w: np.ndarray, block: int = 64) -> dict:
    """bnb-style NF4: per-block absmax scale, nearest NF4 level,
    nibble-packed (2/byte, K-major pairs). Leaf carries the codebook
    so dequant is a 16-entry lookup (quant/kernels.py nf4 path)."""
    K, N = w.shape
    assert K % block == 0 and K % 2 == 0
    wb = w.reshape(K // block, block, N)
    absmax = np.abs(wb).max(axis=1)
    scale = np.where(absmax > 0, absmax, 1.0).astype(np.float32)
    normed = wb / scale[:, None]
    # Nearest codebook level (levels sorted: midpoint thresholds).
    mids = (NF4_LEVELS[1:] + NF4_LEVELS[:-1]) / 2
    q = np.searchsorted(mids, normed.reshape(K, N)).astype(np.uint8)
    q2 = q.reshape(K // 2, 2, N)
    packed = (q2[:, 0] | (q2[:, 1] << 4)).astype(np.uint8)
    return {
        "qweight": packed,
        "scales": jnp.asarray(scale),
        "codebook": jnp.asarray(NF4_LEVELS),
    }


def quantize_params_online(params: dict, method: str, cfg=None,
                           calib_ids=None) -> dict:
    """Replace dense linear leaves with quantized ones (in place).

    ``cfg`` + ``calib_ids`` enable calibration-aware (GPTQ-class)
    error compensation for the 2/3-bit tiers: a dense forward over the
    calibration tokens builds per-leaf Hessians first
    (quant/error_comp.py; ref analog: the INC bits {2,3} family)."""
    hessians = {}
    if calib_ids is not None and method in ("int2", "int3"):
        assert cfg is not None, "calibrated quant needs the ModelConfig"
        from vllm_tpu.quant.error_comp import collect_hessians
        hessians = collect_hessians(params, cfg, list(calib_ids))
    n = 0
    for layer in params["layers"]:
        for name in _LINEAR_LEAVES:
            leaf = layer.get(name)
            if not isinstance(leaf, dict) or "weight" not in leaf:
                continue
            w_arr = leaf.pop("weight")
            w = np.asarray(w_arr, np.float32)
            if method in ("int4", "w4a8"):
                from vllm_tpu.quant.loader import make_device_leaf
                from vllm_tpu.quant.ref import quantize_groupwise
                q, s, z = quantize_groupwise(w, 4, 128, sym=True)
                for k2, v2 in make_device_leaf(q, s, z, None, 4).items():
                    leaf[k2] = jnp.asarray(v2)
                if method == "w4a8":
                    # QQQ-class: same int4-g128 weights, int8 per-token
                    # activations on the int8 MXU (quant/pallas_w4a8).
                    leaf["a8"] = jnp.zeros((0, ), jnp.int8)
            elif method == "int8":
                q, s = _quant_weight_int8(w)
                leaf["qweight"] = jnp.asarray(q)
                leaf["scales"] = jnp.asarray(s)
                # centered storage contract of quant/kernels.py W8A16:
                # stored values are q (already signed) => zbias 0.
                leaf["zbias"] = jnp.zeros_like(jnp.asarray(s))
            elif method == "w8a8_int8":
                q, s = _quant_weight_int8(w)
                leaf["qweight"] = jnp.asarray(q)
                leaf["wscale"] = jnp.asarray(s)
            elif method == "fp8":
                q, s = _quant_weight_fp8(w)
                leaf["qweight"] = jnp.asarray(q)
                leaf["wscale"] = jnp.asarray(s)
            elif method == "nf4":
                for k2, v2 in _quant_weight_nf4(w).items():
                    leaf[k2] = (jnp.asarray(v2)
                                if not hasattr(v2, "dtype") or
                                isinstance(v2, np.ndarray) else v2)
            elif method in ("int2", "int3"):
                bits = int(method[-1])
                h = hessians.get(id(w_arr))
                for k2, v2 in _quant_weight_low_bit(
                        w, bits, hessian=h).items():
                    leaf[k2] = v2
            elif method in ("mxfp4", "mxfp8"):
                from vllm_tpu.quant.mxfp import (quantize_mxfp4,
                                                 quantize_mxfp8)
                fn = quantize_mxfp4 if method == "mxfp4" else \
                    quantize_mxfp8
                for k2, v2 in fn(w).items():
                    leaf[k2] = v2
            else:
                raise ValueError(f"unknown online method {method}")
            n += 1
        # MoE expert stacks (WNA16 int4 only for now — ref analog:
        # moe_wna16 / get_moe_quant_method, auto_gptq.py:73).
        if method == "int4":
            for name in ("w_gate_up", "w_down"):
                w = layer.get(name)
                if w is None or isinstance(w, dict):
                    continue
                layer[name] = _quantize_experts_int4(np.asarray(
                    w, np.float32))
                n += 1
    logger.info("online-quantized %d linear layers to %s", n, method)
    return params


def _quantize_experts_int4(w: np.ndarray) -> dict:
    """[NE, K, N] -> stacked WNA16 leaf (group-128 sym int4)."""
    from vllm_tpu.quant.loader import make_device_leaf
    from vllm_tpu.quant.ref import quantize_groupwise
    qws, ss, zbs = [], [], []
    for e in range(w.shape[0]):
        q, s, z = quantize_groupwise(w[e], 4, 128, sym=True)
        leaf = make_device_leaf(q, s, z, None, 4)
        qws.append(leaf["qweight"])
        ss.append(leaf["scales"])
        zbs.append(leaf["zbias"])
    return {
        "qweight": jnp.asarray(np.stack(qws)),
        "scales": jnp.asarray(np.stack(ss)),
        "zbias": jnp.asarray(np.stack(zbs)),
    }


# -- activation-quantized matmuls (XLA; MXU-native int8/fp8 dots) ------


def _quant_act_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_act_fp8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 448.0)
    q = (x / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def w8a8_matmul(x: jax.Array, leaf: dict) -> jax.Array:
    """Dynamic per-token activation quant + quantized dot + fused
    dual-scale epilogue. Ref analog: cutlass w8a8 scaled_mm +
    per_token_group_quant (csrc quantization/w8a8/)."""
    qw = leaf["qweight"]
    wscale = leaf["wscale"]  # [1, N]
    if qw.dtype == jnp.int8:
        qx, xscale = _quant_act_int8(x)
        acc = jax.lax.dot_general(
            qx, qw, (((x.ndim - 1, ), (0, )), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:  # fp8
        qx, xscale = _quant_act_fp8(x)
        acc = jax.lax.dot_general(
            qx, qw, (((x.ndim - 1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)
    return (acc * xscale * wscale).astype(x.dtype)
