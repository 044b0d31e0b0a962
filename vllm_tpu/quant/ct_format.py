"""compressed-tensors (llm-compressor) checkpoint tensor decoding.

Ref analog: vllm/model_executor/layers/quantization/compressed_tensors/
(schemes/compressed_tensors_wNa16.py weight layout; pack semantics from
utils/quant_utils.py pack_quantized_values_into_int32:537 — values are
packed 32//bits per int32 word, little-endian within the word, along
the INPUT dim for weights and the OUTPUT dim for zero points).

Checkpoint convention (nn.Linear): weight matrices are [N_out, K_in];
our canonical form is [K, N] with unsigned qvals and explicit zeros
(see quant/loader.py), so everything transposes on the way through.
Symmetric int values are stored two's-complement; ``^ 2^(b-1)`` maps
them to the unsigned convention with zero = 2^(b-1).
"""

from __future__ import annotations

import numpy as np


def unpack_int32(packed: np.ndarray, bits: int,
                 axis: int = -1) -> np.ndarray:
    """Inverse of CT pack_quantized_values_into_int32 along ``axis``:
    [..., C, ...] int32 -> [..., C*32//bits, ...] uint values."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    packed = np.moveaxis(packed, axis, -1)
    out = np.zeros(packed.shape[:-1] + (packed.shape[-1] * pf, ),
                   np.int32)
    for i in range(pf):
        out[..., i::pf] = (packed >> (bits * i)) & mask
    return np.moveaxis(out, -1, axis)


def decode_ct_wna16(
    weight_packed: np.ndarray,  # [N, K*bits/32] int32
    weight_scale: np.ndarray,  # [N, G] (G = K/group or 1)
    weight_zero_point: np.ndarray | None,  # [N*bits/32, G] int32 packed
    bits: int,
    K: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, None]:
    """-> canonical (qvals [K, N] unsigned, scales f32 [G, N],
    zeros [G, N], perm=None)."""
    N = weight_packed.shape[0]
    half = 1 << (bits - 1)
    raw = unpack_int32(weight_packed, bits, axis=1)[:, :K]  # [N, K]
    qvals = (raw ^ half).astype(np.uint8).T  # [K, N] unsigned
    scales = weight_scale.astype(np.float32).T  # [G, N]
    if weight_zero_point is None:
        zeros = np.full(scales.shape, half, np.float32)
    else:
        zp_raw = unpack_int32(weight_zero_point, bits, axis=0)[:N]
        zeros = (zp_raw ^ half).astype(np.float32).T  # [G, N]
    return qvals, scales, zeros, None


def decode_ct_w8(weight: np.ndarray,
                 weight_scale: np.ndarray) -> tuple[np.ndarray,
                                                    np.ndarray]:
    """int-/float-quantized (W8A8 int8 or FP8): [N, K] + per-channel or
    per-tensor scale -> ({'qweight' [K,N], 'wscale' [1,N]}) pieces."""
    qw = weight.T  # [K, N] (dtype preserved: int8 or float8)
    scale = np.asarray(weight_scale, np.float32).reshape(-1)
    N = qw.shape[1]
    if scale.size == 1:
        wscale = np.full((1, N), scale[0], np.float32)
    else:
        assert scale.size == N, (scale.shape, qw.shape)
        wscale = scale.reshape(1, N)
    return qw, wscale
