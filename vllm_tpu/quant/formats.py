"""Checkpoint-format decoders: GPTQ / AWQ (incl. AutoRound exports) ->
canonical (qvals, scales, zeros).

Bit-layout ground truth mirrors the reference's repack kernels
(ref: csrc/libtorch_stable/quantization/marlin awq/gptq repack and
vllm/model_executor/layers/quantization/utils/marlin_utils.py
unpack helpers):

- GPTQ: ``qweight`` int32 [K/pack, N], pack factor 32//bits values per
  int32 along **K**, LSB-first. ``qzeros`` int32 [K/g, N/pack] packed
  along N, stored as (zero - 1) in most GPTQ exports — the +1 is
  re-added here. ``scales`` f16 [K/g, N]. Optional ``g_idx`` [K] maps
  each input row to its group (desc_act).
- AWQ: ``qweight`` int32 [K, N/pack] packed along **N** with the
  interleaved order [0, 2, 4, 6, 1, 3, 5, 7]; ``qzeros`` int32
  [K/g, N/pack] same order; ``scales`` f16 [K/g, N]. Always asym.
- AutoRound exports reuse these containers (format
  ``auto_round:auto_gptq`` / ``auto_round:auto_awq``, ref:
  vllm/model_executor/layers/quantization/inc.py:37-50); AutoRound-sym
  GPTQ stores true zeros (no off-by-one) — handled via
  ``gptq_zero_offset``.
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def _unpack_int32_rows(packed: np.ndarray, bits: int) -> np.ndarray:
    """Unpack along axis 0 (GPTQ K-packing): [K/p, N] -> [K, N]."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    out = np.empty((packed.shape[0] * pack, packed.shape[1]), np.int32)
    pu = packed.astype(np.uint32)
    for i in range(pack):
        out[i::pack] = (pu >> (bits * i)) & mask
    return out


def _unpack_int32_cols(packed: np.ndarray, bits: int,
                       order: list[int] | None) -> np.ndarray:
    """Unpack along axis 1 (AWQ N-packing): [K, N/p] -> [K, N]."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    K, Np = packed.shape
    out = np.empty((K, Np * pack), np.int32)
    pu = packed.astype(np.uint32)
    positions = order if order is not None else list(range(pack))
    for slot, logical in enumerate(positions):
        out[:, logical::pack] = (pu >> (bits * slot)) & mask
    return out


def decode_gptq(
    qweight: np.ndarray,  # int32 [K//pack, N]
    qzeros: np.ndarray,  # int32 [K//g, N//pack]
    scales: np.ndarray,  # f16/f32 [K//g, N]
    g_idx: np.ndarray | None,
    bits: int,
    zero_offset: int = 1,  # GPTQ stores zero-1; AutoRound-sym stores zero
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Returns (qvals [K,N], scales f32, zeros [K//g,N], perm or None).

    With desc_act (g_idx), rows are sorted by group and ``perm`` maps
    sorted position -> original K index; the kernel applies ``x[:,
    perm]`` (activation reorder, ref: MPLinearKernel.py:22 g_idx
    handling).
    """
    qvals = _unpack_int32_rows(qweight, bits)
    zeros = _unpack_int32_cols(qzeros, bits, None) + zero_offset
    scales = scales.astype(np.float32)
    perm = None
    if g_idx is not None and len(g_idx) and not _is_trivial_gidx(
            g_idx, qvals.shape[0], scales.shape[0]):
        perm = np.argsort(g_idx, kind="stable").astype(np.int32)
        qvals = qvals[perm]
    return qvals, scales, zeros, perm


def _is_trivial_gidx(g_idx: np.ndarray, K: int, G: int) -> bool:
    group_size = K // G
    return bool(np.all(g_idx == (np.arange(K) // group_size)))


def decode_awq(
    qweight: np.ndarray,  # int32 [K, N//pack]
    qzeros: np.ndarray,  # int32 [K//g, N//pack]
    scales: np.ndarray,  # f16 [K//g, N]
    bits: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (qvals [K,N], scales f32, zeros [K//g,N])."""
    order = AWQ_ORDER if bits == 4 else None
    qvals = _unpack_int32_cols(qweight, bits, order)
    zeros = _unpack_int32_cols(qzeros, bits, order)
    return qvals, scales.astype(np.float32), zeros


# -- synthetic checkpoint writers (tests + tooling) ---------------------


def encode_gptq(qvals: np.ndarray, scales: np.ndarray, zeros: np.ndarray,
                bits: int, zero_offset: int = 1) -> dict[str, np.ndarray]:
    pack = 32 // bits
    K, N = qvals.shape
    qweight = np.zeros((K // pack, N), np.uint32)
    for i in range(pack):
        qweight |= qvals[i::pack].astype(np.uint32) << (bits * i)
    G = zeros.shape[0]
    z = (zeros - zero_offset).astype(np.uint32)
    qz = np.zeros((G, N // pack), np.uint32)
    for i in range(pack):
        qz |= z[:, i::pack] << (bits * i)
    return {
        "qweight": qweight.astype(np.int32),
        "qzeros": qz.astype(np.int32),
        "scales": scales.astype(np.float16),
        "g_idx": (np.arange(K) // (K // G)).astype(np.int32),
    }


def encode_awq(qvals: np.ndarray, scales: np.ndarray, zeros: np.ndarray,
               bits: int) -> dict[str, np.ndarray]:
    pack = 32 // bits
    order = AWQ_ORDER if bits == 4 else list(range(pack))
    K, N = qvals.shape
    qweight = np.zeros((K, N // pack), np.uint32)
    for slot, logical in enumerate(order):
        qweight |= qvals[:, logical::pack].astype(np.uint32) << (bits * slot)
    G = zeros.shape[0]
    qz = np.zeros((G, N // pack), np.uint32)
    for slot, logical in enumerate(order):
        qz |= zeros[:, logical::pack].astype(np.uint32) << (bits * slot)
    return {
        "qweight": qweight.astype(np.int32),
        "qzeros": qz.astype(np.int32),
        "scales": scales.astype(np.float16),
    }
