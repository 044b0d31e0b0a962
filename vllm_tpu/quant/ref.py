"""Group-quantization reference math + device packing (host numpy).

Canonical internal form for weight-only group quant (the common
denominator of GPTQ / AWQ / AutoRound exports, ref conventions:
vllm/model_executor/layers/quantization/utils/quant_utils.py):

    qvals:  int  [K, N]   (unsigned storage, 0..2^bits-1)
    scales: f32  [K//g, N]
    zeros:  int  [K//g, N] (asym) or the constant 2^(bits-1) (sym)

    dequant(k, n) = (qvals[k, n] - zeros[k//g, n]) * scales[k//g, n]

Device format (co-designed with the Pallas dequant-GEMM,
quant/pallas_w4a16.py — marlin-style prepack, ref analog:
csrc/.../marlin repack + MPLinearKernel.process_weights_after_loading):

- 4-bit: per K-tile *half-split* nibble packing. For tile rows
  [t, t+BKT): byte row r holds q[t+r] in the low nibble and
  q[t + BKT//2 + r] in the high nibble -> in-kernel unpack is a pure
  sublane concat (no interleave relayout).
- 8-bit: plain int8 [K, N].
"""

from __future__ import annotations

import numpy as np

# K rows covered by one packed tile (must be a multiple of 2*group_size
# or divide it cleanly; kernel block size along K).
PACK_TILE_K = 256


def quantize_groupwise(
    w: np.ndarray,  # [K, N] float
    bits: int,
    group_size: int,
    sym: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference quantizer (absmax sym / minmax asym per group).

    Returns (qvals uint [K,N], scales f32 [K//g,N], zeros uint
    [K//g,N]).
    """
    K, N = w.shape
    assert K % group_size == 0
    G = K // group_size
    wg = w.reshape(G, group_size, N).astype(np.float64)
    qmax = (1 << bits) - 1
    if sym:
        mid = 1 << (bits - 1)
        absmax = np.abs(wg).max(axis=1)  # [G, N]
        scales = np.where(absmax == 0, 1.0, absmax / (qmax - mid))
        zeros = np.full((G, N), mid, np.int32)
        q = np.rint(wg / scales[:, None, :]) + mid
    else:
        wmin = wg.min(axis=1)
        wmax = wg.max(axis=1)
        scales = np.where(wmax == wmin, 1.0, (wmax - wmin) / qmax)
        zeros = np.clip(np.rint(-wmin / scales), 0, qmax).astype(np.int32)
        q = np.rint(wg / scales[:, None, :]) + zeros[:, None, :]
    q = np.clip(q, 0, qmax).astype(np.int32).reshape(K, N)
    return q, scales.astype(np.float32), zeros


def dequantize_groupwise(
    qvals: np.ndarray,  # [K, N] uint
    scales: np.ndarray,  # [K//g, N]
    zeros: np.ndarray,  # [K//g, N]
    group_size: int,
) -> np.ndarray:
    K, N = qvals.shape
    G = K // group_size
    q = qvals.reshape(G, group_size, N).astype(np.float32)
    return ((q - zeros[:, None, :].astype(np.float32)) *
            scales[:, None, :]).reshape(K, N)


def pack_w4_halfsplit(qvals: np.ndarray,
                      tile_k: int = PACK_TILE_K) -> np.ndarray:
    """[K, N] uint (0..15) -> [K//2, N] uint8, per-tile half-split."""
    K, N = qvals.shape
    assert K % tile_k == 0, f"K={K} not a multiple of tile_k={tile_k}"
    half = tile_k // 2
    t = qvals.reshape(K // tile_k, 2, half, N)  # [T, half-idx, r, N]
    lo = t[:, 0]  # rows [t, t+half)
    hi = t[:, 1]  # rows [t+half, t+tile)
    packed = (lo | (hi << 4)).astype(np.uint8)  # [T, half, N]
    return packed.reshape(K // 2, N)


def unpack_w4_halfsplit(packed: np.ndarray,
                        tile_k: int = PACK_TILE_K) -> np.ndarray:
    """Inverse of pack_w4_halfsplit -> [K, N] uint8 (0..15)."""
    K2, N = packed.shape
    K = K2 * 2
    half = tile_k // 2
    p = packed.reshape(K // tile_k, half, N)
    lo = p & 0xF
    hi = p >> 4
    return np.stack([lo, hi], axis=1).reshape(K, N)
