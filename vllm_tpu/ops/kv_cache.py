"""Paged KV-cache layout and write-through.

Layout (TPU-first): one fused array per attention layer

    kv_cache: [num_blocks, 2 * num_kv_heads, block_size, head_dim_pad]

**Split-plane order**: K planes occupy slots [0, KH), V planes
[KH, 2KH) (plane h / plane KH + h for head h). A head group's K (or V)
planes are then *contiguous*, so kernels fetch a whole group in one
DMA and fold all heads into one MXU dot via a plain reshape — the
layout that makes head-batched flash attention free. The trailing
dims (block_size, head_dim_pad) satisfy Mosaic's alignment rule — DMA
slice shapes must be multiples of the (8/16, 128) tile, so
``head_dim_pad = round_up(head_dim, 128)``. The 2x pad waste for
head_dim-64 models is a known cost (production models are head_dim
128).

Per-token-head scale planes (QuantKV.scales) are laid out
[num_blocks, SUBLANE, round_up(KH * block_size, LANE)] f32 with row 0
= K scales, row 1 = V scales, lane h * block_size + t = (head h,
token t) — the (head-major, token-minor) lane order matches the
column order of the head-batched score matrix, so kernels apply
K-scales to score columns and V-scales to prob columns with lane
slices only (zero relayouts).

Ref analog: csrc reshape_and_cache (cache_kernels.cu) + the KV-cache
shape contract of AttentionBackend (vllm/v1/attention/backend.py).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from vllm_tpu.utils import round_up

# Slot mapping convention: slot = block_id * block_size + offset, flat
# into [num_blocks * block_size). Padding tokens map into block 0 (the
# scheduler's null block) — harmlessly overwritten garbage.

LANE = 128
SUBLANE = 8


class QuantKV(NamedTuple):
    """Per-token-head quantized paged KV cache (ref analog:
    vllm/v1/attention/ops/int4_per_token_head.py int8/int4 modes +
    KVQuantMode, kv_cache_interface.py:33).

    data:   [num_blocks, 2*KH, block_size, Dp] int8 / float8_e4m3fn in
            split-plane order (K planes [0, KH), V planes [KH, 2KH)),
            or [num_blocks, KH, block_size, Dp] uint8 K|V<<4 nibble
            pairs for the packed 4-bit modes.
    scales: [num_blocks, SUBLANE, SL] f32, SL = round_up(KH *
            block_size, LANE). Row 0 = K scales, row 1 = V scales;
            lane h * block_size + t dequantizes (head h, token t).
            The (head-major, token-minor) lane order matches the
            column order of head-batched score matrices, so kernels
            apply K-scales to score columns and V-scales to prob
            columns with lane slices only — no sublane/lane
            transposes.
    codebook: None for the uniform modes; a small [L] f32 level table
            for TurboQuant codebook modes (tq3/tq4 — ref analog:
            vllm/v1/attention/backends/turboquant_attn.py +
            quantization/turboquant/): nibbles index Lloyd-Max-optimal
            N(0,1) levels in the RHT-rotated basis, scales carry the
            per-(token, plane) RMS.
    """
    data: jax.Array
    scales: jax.Array
    codebook: jax.Array | None = None


KVCache = Union[jax.Array, QuantKV]


def kv_cache_jnp_dtype(cache_dtype: str, model_dtype: str):
    """Resolve CacheConfig.cache_dtype to the *data* jnp dtype.

    fp8 == e4m3 (the reference's default fp8 KV flavor, ref:
    vllm/config/cache.py:19-35 CacheDType), scale-less dynamic-range
    cast. int8 / fp8_pth are per-token-head modes carrying a QuantKV
    scale plane (see make_kv_cache).
    """
    if cache_dtype == "auto":
        return jnp.dtype(model_dtype)
    if cache_dtype in ("fp8", "fp8_pth"):
        return jnp.float8_e4m3fn
    if cache_dtype == "int8":
        return jnp.int8
    if cache_dtype in ("int4", "tq4", "tq3"):
        return jnp.uint8  # two nibbles per byte along head_dim
    if cache_dtype in ("bfloat16", "float32", "float16"):
        return jnp.dtype(cache_dtype)
    raise NotImplementedError(f"cache_dtype {cache_dtype}")


def is_per_token_head(cache_dtype: str) -> bool:
    return cache_dtype in ("int8", "fp8_pth", "int4", "tq4", "tq3")


# Lloyd-Max-optimal scalar quantizer levels for N(0, 1) (the RHT
# rotation gaussianizes coordinates, so a fixed Gaussian codebook is
# near-optimal per token-head — TurboQuant's core observation). tq3
# packs 8 levels in the same nibble container as tq4: byte alignment
# beats the extra bit on TPU (DMA tiling), the codebook is what differs.
TQ4_LEVELS = (-2.7326, -2.0690, -1.6181, -1.2562, -0.9424, -0.6568,
              -0.3881, -0.1284, 0.1284, 0.3881, 0.6568, 0.9424, 1.2562,
              1.6181, 2.0690, 2.7326)
TQ3_LEVELS = (-2.1520, -1.3439, -0.7560, -0.2451, 0.2451, 0.7560,
              1.3439, 2.1520)


def tq_codebook(cache_dtype: str) -> jax.Array:
    return jnp.asarray(TQ4_LEVELS if cache_dtype == "tq4" else TQ3_LEVELS,
                       jnp.float32)


import functools as _ft


@_ft.lru_cache(maxsize=8)
def _odd_poly_coeffs(levels: tuple) -> tuple | None:
    """Exact-fit odd polynomial for a symmetric codebook, parameterized
    on the INTEGER doubled-centered index u2 = 2*idx - (L-1) (odd ints
    ±1..±(L-1)): level(idx) = u2 * P(u2²) with P's L/2 coefficients
    solved in f64 then rescaled by exact powers of two from the
    natural u = u2/2 parameterization. The integer parameterization
    matters: u2 comes off one bitcast and ONE subtract of an exactly
    representable constant (2^23 + (L-1)); a half-integer recenter
    would invite XLA's reassociation to fold (x - 2^23) - 7.5 into an
    unrepresentable constant (ulp at 2^23 is 1.0 — observed, wrong by
    0.5). Returns None when the table is not symmetric or the f32
    Horner evaluation drifts beyond 1e-6 of the table."""
    import numpy as np
    L = len(levels)
    half = L // 2
    if not all(levels[j] == -levels[L - 1 - j] for j in range(half)):
        return None
    lv = np.array(levels, np.float64)
    u = np.arange(L) - (L - 1) / 2.0
    s = u[half:] ** 2
    c = np.polyfit(s, lv[half:] / u[half:], half - 1)
    # Rescale to the u2 = 2u parameterization: u*P(u²) =
    # (u2/2) * sum c_k (u2²/4)^(half-1-k) — exact power-of-two scaling.
    c2 = np.array([
        ck / (2.0 * 4.0**(half - 1 - k)) for k, ck in enumerate(c)
    ]).astype(np.float32)
    # verify f32 Horner reproduces the table
    u2 = (2 * np.arange(L) - (L - 1)).astype(np.float32)
    sf = (u2 * u2).astype(np.float32)
    acc = np.full_like(sf, c2[0])
    for k in range(1, half):
        acc = (acc * sf + c2[k]).astype(np.float32)
    if np.abs(acc * u2 - lv.astype(np.float32)).max() > 1e-6:
        return None
    return tuple(float(x) for x in c2)


def codebook_select(idx: jax.Array, levels: tuple) -> jax.Array:
    """Vector codebook lookup without a gather (Mosaic has none).

    Symmetric Lloyd-Max tables (levels[j] == -levels[L-1-j]) evaluate
    as an odd polynomial u * P(u²) — ~11 VPU ops for 16 levels vs ~20
    for the folded select chain (measured: the chain made tq4 decode
    ~1.9x the bf16 attention cost; VERDICT r2 item 4). The fit is
    exact to ~6e-8 (verified at build in _odd_poly_coeffs) and shared
    by the Pallas kernels and the XLA reference dequant, so the two
    paths stay bit-identical."""
    L = len(levels)
    half = L // 2
    c = _odd_poly_coeffs(levels)
    if c is not None:
        # idx -> f32 via the exponent-bias trick (ops/pallas/fp8.py
        # int8_to_f32 rationale: Mosaic's i32->f32 convert is slow):
        # OR the doubled index into the 2^23 mantissa; ONE subtract of
        # the exactly-representable integer 2^23 + (L-1) yields
        # u2 = 2*idx - (L-1). Same-width bitcast lowers in both
        # Mosaic and plain XLA.
        bits = (idx << 1) | jnp.int32(0x4B000000)
        u2 = jax.lax.bitcast_convert_type(bits, jnp.float32) - (
            8388608.0 + (L - 1))
        s = u2 * u2
        acc = jnp.full(idx.shape, c[0], jnp.float32)
        for k in range(1, half):
            acc = acc * s + c[k]
        return acc * u2
    if all(levels[j] == -levels[L - 1 - j] for j in range(half)):
        mags = levels[half:]
        m_idx = jnp.where(idx >= half, idx - half, half - 1 - idx)
        x = jnp.full(idx.shape, mags[0], jnp.float32)
        for j in range(1, half):
            x = jnp.where(m_idx == j, mags[j], x)
        return jnp.where(idx >= half, x, -x)
    x = jnp.full(idx.shape, levels[0], jnp.float32)
    for j in range(1, L):
        x = jnp.where(idx == j, levels[j], x)
    return x


def is_packed_int4(data: jax.Array) -> bool:
    """int4 per-token-head caches store uint8 nibble pairs."""
    return data.dtype == jnp.uint8


def quant_max(dtype) -> float:
    """Largest representable magnitude of the quantized data dtype."""
    return 127.0 if dtype == jnp.int8 else 448.0  # e4m3 max


def scale_lanes(num_kv_heads: int, block_size: int) -> int:
    """Lane width of the per-token-head scale planes: (head, token)
    pairs, head-major, padded to a full lane tile."""
    return max(round_up(num_kv_heads * block_size, LANE), LANE)


def make_kv_cache(num_blocks: int, block_size: int, num_kv_heads: int,
                  head_dim: int, cache_dtype: str, model_dtype: str,
                  sharding=None) -> KVCache:
    """Allocate one layer's cache (plain array or QuantKV)."""
    assert block_size <= LANE, "per-token-head scales assume bs <= 128"
    dtype = kv_cache_jnp_dtype(cache_dtype, model_dtype)
    shape = kv_cache_shape(num_blocks, block_size, num_kv_heads, head_dim)
    if cache_dtype in ("int4", "tq4", "tq3"):
        # Nibble modes pack K (low nibble) and V (high nibble) of the
        # same head into one byte plane: [B, KH, bs, Dp]. Packing along
        # the *plane* axis (not head_dim) keeps the trailing dim a full
        # 128 lanes so kernels can DMA tile-aligned slices and unpack
        # with pure vector ops — the KV analog of the W4A16 kernel's
        # half-split prepack (quant/pallas_w4a16.py).
        shape = (shape[0], num_kv_heads) + shape[2:]

    def put(x, sh):
        return jax.device_put(x, sh) if sh is not None else x

    data_sh = scale_sh = None
    if sharding is not None:
        data_sh, scale_sh = (sharding if isinstance(sharding, tuple)
                             else (sharding, None))
    data = put(jnp.zeros(shape, dtype), data_sh)
    if not is_per_token_head(cache_dtype):
        return data
    scales = put(
        jnp.ones((num_blocks, SUBLANE,
                  scale_lanes(num_kv_heads, block_size)), jnp.float32),
        scale_sh)
    if cache_dtype in ("tq4", "tq3"):
        return QuantKV(data, scales, tq_codebook(cache_dtype))
    return QuantKV(data, scales)


def kv_cache_bytes_per_block(block_size: int, num_kv_heads: int,
                             head_dim: int, cache_dtype: str,
                             model_dtype: str) -> int:
    dtype = kv_cache_jnp_dtype(cache_dtype, model_dtype)
    n = (2 * num_kv_heads * block_size * padded_head_dim(head_dim) *
         jnp.dtype(dtype).itemsize)
    if cache_dtype in ("int4", "tq4", "tq3"):
        n //= 2
    if is_per_token_head(cache_dtype):
        n += SUBLANE * scale_lanes(num_kv_heads, block_size) * 4
    return n


def padded_head_dim(head_dim: int) -> int:
    return round_up(head_dim, LANE)


def kv_cache_shape(num_blocks: int, block_size: int, num_kv_heads: int,
                   head_dim: int) -> tuple[int, int, int, int]:
    return (num_blocks, 2 * num_kv_heads, block_size,
            padded_head_dim(head_dim))


def split_kv(kv_cache: jax.Array) -> tuple[jax.Array, jax.Array]:
    """View K and V planes: [num_blocks, KH, block_size, Dp] each
    (split-plane order: K first, then V)."""
    kh = kv_cache.shape[1] // 2
    return kv_cache[:, :kh], kv_cache[:, kh:]


def quantize_rows(kv: jax.Array, qdtype) -> tuple[jax.Array, jax.Array]:
    """Per-(token, plane) symmetric quantization.

    kv [T, 2KH, Dp] float -> (q [T, 2KH, Dp] qdtype, scales [T, 2KH]
    f32). Round-half-up (floor(x+0.5)) — the Pallas write path uses the
    identical formula so cache contents are bit-equal across paths.
    """
    kvf = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kvf), axis=-1)  # [T, 2KH]
    qmax = quant_max(qdtype)
    scale = amax / qmax
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0),
                    0.0)
    scaled = kvf * inv[..., None]
    if qdtype == jnp.int8:
        q = jnp.clip(jnp.floor(scaled + 0.5), -qmax, qmax).astype(
            jnp.int8)
    else:
        # Flush sub-2^-6 magnitudes (e4m3 subnormal range) to zero:
        # the kernels' hot-path decode is flush-to-zero (fp8.py
        # e4m3ftz_to_f32), and encoding the flush keeps cache bytes
        # bit-identical across the XLA and Pallas write paths.
        scaled = jnp.where(jnp.abs(scaled) < 0.015625, 0.0, scaled)
        q = scaled.astype(qdtype)
    return q, scale


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _rht_matrix(dp: int):
    """Deterministic random-sign Hadamard rotation [dp, dp] (ref
    analog: the RHT pre-rotation of int4 per-token-head KV,
    vllm/v1/attention/ops/int4_per_token_head.py + TurboQuant's
    incoherence processing). Orthonormal: H @ H.T == I.

    Returns numpy (not jax) so the lru_cache never captures a tracer:
    jnp ops convert it to an on-device constant at each use site."""
    import numpy as np
    assert dp & (dp - 1) == 0, f"Dp={dp} must be a power of 2"
    h = np.array([[1.0]])
    while h.shape[0] < dp:
        h = np.block([[h, h], [h, -h]])
    signs = np.where(
        np.random.default_rng(1234).random(dp) < 0.5, -1.0, 1.0)
    return ((h * signs[None, :]) / np.sqrt(dp)).astype(np.float32)


def quantize_rows_int4(kv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """RHT-rotate + per-(token, plane) symmetric int4, nibble-packed.

    kv [T, 2KH, Dp] float -> (packed uint8 [T, KH, Dp] — low nibble =
    K plane 2h biased +8, high nibble = V plane 2h+1 —, scales
    [T, 2KH] f32 in the *rotated* basis; dequant un-rotates, so
    consumers stay in the original basis.
    """
    dp = kv.shape[-1]
    rot = kv.astype(jnp.float32) @ _rht_matrix(dp)
    amax = jnp.max(jnp.abs(rot), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0),
                    0.0)
    q = jnp.clip(jnp.floor(rot * inv[..., None] + 0.5), -7, 7)
    q = (q + 8.0).astype(jnp.uint8)  # 1..15 (0 unused)
    kh = kv.shape[-2] // 2  # split-plane order: K rows then V rows
    packed = q[..., :kh, :] | (q[..., kh:, :] << 4)  # K | V<<4
    return packed, scale


def quantize_rows_tq(kv: jax.Array,
                     codebook: jax.Array) -> tuple[jax.Array, jax.Array]:
    """TurboQuant codebook quantization: RHT-rotate, RMS-normalize per
    (token, plane), snap to the nearest codebook level, nibble-pack the
    indices. The rotation gaussianizes coordinates so the fixed N(0,1)
    Lloyd-Max codebook is near-optimal (ref analog: the TurboQuant
    quantizer, vllm quantization/turboquant/)."""
    dp = kv.shape[-1]
    rot = kv.astype(jnp.float32) @ _rht_matrix(dp)
    scale = jnp.sqrt(jnp.mean(rot * rot, axis=-1))  # RMS ~ sigma
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0),
                    0.0)
    norm = rot * inv[..., None]
    mid = (codebook[1:] + codebook[:-1]) * 0.5
    idx = jnp.searchsorted(mid, norm).astype(jnp.uint8)  # [.., 2KH, dp]
    kh = kv.shape[-2] // 2  # split-plane order: K rows then V rows
    packed = idx[..., :kh, :] | (idx[..., kh:, :] << 4)  # K | V<<4
    return packed, scale


def _unpack_tq(data: jax.Array, codebook: jax.Array) -> jax.Array:
    """[N, KH, ..., Dp] uint8 K|V<<4 nibble indices ->
    [N, 2KH, ..., Dp] f32 levels (split-plane order: K then V).

    Uses codebook_select (not a gather) so this XLA reference path is
    bit-identical to the kernels' in-VMEM decode; the static level
    table is recovered from the traced codebook's length."""
    levels = TQ4_LEVELS if codebook.shape[0] == 16 else TQ3_LEVELS
    k = codebook_select((data & 0xF).astype(jnp.int32), levels)
    v = codebook_select((data >> 4).astype(jnp.int32), levels)
    return jnp.concatenate([k, v], axis=1)


def _unpack_int4(data: jax.Array) -> jax.Array:
    """[N, KH, ..., Dp] uint8 K|V<<4 -> [N, 2KH, ..., Dp] f32
    (split-plane order: K then V)."""
    k = (data & 0xF).astype(jnp.float32) - 8.0
    v = (data >> 4).astype(jnp.float32) - 8.0
    return jnp.concatenate([k, v], axis=1)


def parity_scale_lane(offset, block_size: int):
    """Within-head scale lane for parity-split layouts (fp8_pth): even
    tokens pack into the head's first bs/2 lanes, odd tokens into the
    second half — lane = (t >> 1) + (t & 1) * bs/2.

    Why: the Pallas kernels' quad-byte e4m3 decode (u8 tile viewed as
    i32 without widening, magnitude bits placed straight into bf16
    slots) emits rows in [evens; odds] order per (block, head) tile;
    storing scales in the same order keeps the score-column scale
    vector a plain lane slice — no in-kernel gather, no extra ops."""
    return (offset >> 1) + (offset & 1) * (block_size // 2)


def is_parity_scales(data_dtype) -> bool:
    """True when the cache mode stores parity-split scale lanes
    (scaled e4m3 caches, i.e. fp8_pth)."""
    return data_dtype == jnp.float8_e4m3fn


def _plane_scales(scales: jax.Array, kh: int, bs: int,
                  parity: bool = False) -> jax.Array:
    """[B, SUBLANE, SL] (row 0 = K, row 1 = V; lane h*bs+t, or the
    parity-split lane order for fp8_pth) -> [B, 2KH, bs] in split-plane
    order, token-indexed."""
    B = scales.shape[0]
    ks = scales[:, 0, :kh * bs].reshape(B, kh, bs)
    vs = scales[:, 1, :kh * bs].reshape(B, kh, bs)
    if parity:
        t = jnp.arange(bs, dtype=jnp.int32)
        lane = parity_scale_lane(t, bs)
        ks = ks[:, :, lane]
        vs = vs[:, :, lane]
    return jnp.concatenate([ks, vs], axis=1)


def dequant_block_kv(qkv: QuantKV) -> jax.Array:
    """Materialize the float cache [num_blocks, 2KH, bs, Dp] f32
    (XLA reference path; kernels dequantize in VMEM instead)."""
    data, scales, codebook = qkv
    if codebook is not None:  # TurboQuant codebook modes
        vals = _unpack_tq(data, codebook)  # rotated basis
        s = _plane_scales(scales, vals.shape[1] // 2, vals.shape[2])
        rot = vals * s[..., None]
        return rot @ _rht_matrix(vals.shape[-1]).T
    if is_packed_int4(data):
        vals = _unpack_int4(data)  # rotated basis
        s = _plane_scales(scales, vals.shape[1] // 2, vals.shape[2])
        rot = vals * s[..., None]
        return rot @ _rht_matrix(vals.shape[-1]).T
    num_blocks, kh2, bs, dp = data.shape
    s = _plane_scales(scales, kh2 // 2, bs,
                      parity=is_parity_scales(data.dtype))
    f = data.astype(jnp.float32)
    if data.dtype == jnp.float8_e4m3fn:
        # Match the kernels' flush-to-zero decode on arbitrary bytes
        # (encoders never store subnormal codes; see quantize_rows).
        f = jnp.where(jnp.abs(f) < 0.015625, 0.0, f)
    return f * s[..., None]


def write_kv_xla(
    kv_cache: KVCache,  # [num_blocks, 2*KH, block_size, Dp] (+scales)
    k: jax.Array,  # [T, KH, D]
    v: jax.Array,  # [T, KH, D]
    slot_mapping: jax.Array,  # [T] int32, flat slots
    oob: str | None = None,
) -> KVCache:
    """Scatter new K/V rows into the paged cache (functional; caller
    donates kv_cache under jit so XLA updates in place). ``oob="drop"``
    makes out-of-range slots explicit no-ops (context parallelism
    writes only rank-owned slots, parallel/context.py)."""
    data = kv_cache.data if isinstance(kv_cache, QuantKV) else kv_cache
    num_blocks, _, block_size, dp = data.shape
    T, KH, D = k.shape
    kh2 = 2 * KH
    if D < dp:
        pad = [(0, 0), (0, 0), (0, dp - D)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # Split-plane order: K rows then V rows.
    kv = jnp.concatenate([k, v], axis=1)  # [T, 2KH, dp]
    block_idx = slot_mapping // block_size
    offset = slot_mapping % block_size
    mode = dict(mode=oob) if oob is not None else {}

    def put_scales(scales, scale, parity: bool = False):
        """scale [T, 2KH] (K rows then V) -> lane h*bs + offset of
        rows 0 (K) / 1 (V); parity-split lane order for fp8_pth
        (see parity_scale_lane)."""
        off = (parity_scale_lane(offset, block_size) if parity
               else offset)
        lane = (jnp.arange(KH, dtype=offset.dtype)[None, :] * block_size
                + off[:, None])  # [T, KH]
        bidx = block_idx[:, None]
        scales = scales.at[bidx, 0, lane].set(scale[:, :KH], **mode)
        return scales.at[bidx, 1, lane].set(scale[:, KH:], **mode)

    if isinstance(kv_cache, QuantKV) and kv_cache.codebook is not None:
        q, scale = quantize_rows_tq(kv, kv_cache.codebook)
        new_data = data.at[block_idx, :, offset, :].set(q, **mode)
        return QuantKV(new_data, put_scales(kv_cache.scales, scale),
                       kv_cache.codebook)
    if isinstance(kv_cache, QuantKV) and is_packed_int4(data):
        q, scale = quantize_rows_int4(kv)
        new_data = data.at[block_idx, :, offset, :].set(q, **mode)
        return QuantKV(new_data, put_scales(kv_cache.scales, scale))
    if isinstance(kv_cache, QuantKV):
        q, scale = quantize_rows(kv, data.dtype)
        new_data = data.at[block_idx, :, offset, :].set(q, **mode)
        return QuantKV(new_data,
                       put_scales(kv_cache.scales, scale,
                                  parity=is_parity_scales(data.dtype)))
    if data.dtype == jnp.float8_e4m3fn:
        # Flush the subnormal range so the FTZ decode round-trips
        # (fp8.py e4m3ftz_to_f32).
        kv = jnp.where(jnp.abs(kv.astype(jnp.float32)) < 0.015625,
                       0.0, kv.astype(jnp.float32))
    kv = kv.astype(data.dtype)
    # Advanced indexing: per token t, cache[block[t], :, offset[t], :] = kv[t]
    return data.at[block_idx, :, offset, :].set(kv, **mode)
