"""Paged KV-cache layout and write-through.

Layout (TPU-first): one fused array per attention layer

    kv_cache: [num_blocks, 2 * num_kv_heads, block_size, head_dim_pad]

K at even head slots, V at odd (interleaved), *head-major*: the
attention kernel's per-(block, head) DMA then only indexes untiled
leading dims, and the tiled trailing dims (block_size, head_dim_pad)
satisfy Mosaic's alignment rule — DMA slice shapes must be multiples of
the (8/16, 128) tile, so ``head_dim_pad = round_up(head_dim, 128)``.
The 2x pad waste for head_dim-64 models is a known cost (production
models are head_dim 128); a packed dual-head layout can reclaim it
later.

Ref analog: csrc reshape_and_cache (cache_kernels.cu) + the KV-cache
shape contract of AttentionBackend (vllm/v1/attention/backend.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.utils import round_up

# Slot mapping convention: slot = block_id * block_size + offset, flat
# into [num_blocks * block_size). Padding tokens map into block 0 (the
# scheduler's null block) — harmlessly overwritten garbage.

LANE = 128


def kv_cache_jnp_dtype(cache_dtype: str, model_dtype: str):
    """Resolve CacheConfig.cache_dtype to a jnp dtype.

    fp8 == e4m3 (the reference's default fp8 KV flavor, ref:
    vllm/config/cache.py:19-35 CacheDType). int8 per-token-head arrives
    with its scale-packed layout; fp8 uses scale 1.0 (e4m3 dynamic
    range covers bf16 KV magnitudes; per-layer scales can be loaded
    from checkpoints later).
    """
    if cache_dtype == "auto":
        return jnp.dtype(model_dtype)
    if cache_dtype == "fp8":
        return jnp.float8_e4m3fn
    if cache_dtype in ("bfloat16", "float32", "float16"):
        return jnp.dtype(cache_dtype)
    raise NotImplementedError(f"cache_dtype {cache_dtype}")


def padded_head_dim(head_dim: int) -> int:
    return round_up(head_dim, LANE)


def kv_cache_shape(num_blocks: int, block_size: int, num_kv_heads: int,
                   head_dim: int) -> tuple[int, int, int, int]:
    return (num_blocks, 2 * num_kv_heads, block_size,
            padded_head_dim(head_dim))


def split_kv(kv_cache: jax.Array) -> tuple[jax.Array, jax.Array]:
    """View K and V planes: [num_blocks, KH, block_size, Dp] each."""
    return kv_cache[:, 0::2], kv_cache[:, 1::2]


def write_kv_xla(
    kv_cache: jax.Array,  # [num_blocks, 2*KH, block_size, Dp]
    k: jax.Array,  # [T, KH, D]
    v: jax.Array,  # [T, KH, D]
    slot_mapping: jax.Array,  # [T] int32, flat slots
) -> jax.Array:
    """Scatter new K/V rows into the paged cache (functional; caller
    donates kv_cache under jit so XLA updates in place)."""
    num_blocks, kh2, block_size, dp = kv_cache.shape
    T, KH, D = k.shape
    if D < dp:
        pad = [(0, 0), (0, 0), (0, dp - D)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    kv = jnp.stack([k, v], axis=2).reshape(T, kh2, dp)
    kv = kv.astype(kv_cache.dtype)
    block_idx = slot_mapping // block_size
    offset = slot_mapping % block_size
    # Advanced indexing: per token t, cache[block[t], :, offset[t], :] = kv[t]
    return kv_cache.at[block_idx, :, offset, :].set(kv)
