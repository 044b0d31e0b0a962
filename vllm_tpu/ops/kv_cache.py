"""Paged KV-cache layout and write-through.

Layout (TPU-first): one fused array per attention layer

    kv_cache: [num_blocks, block_size, 2 * num_kv_heads, head_dim]

with K at even head slots and V at odd (interleaved). One array per
layer halves DMA count in the attention kernel (a single
[block_size, 2KH, D] copy brings both K and V for a block) and keeps
the last dim = head_dim aligned to the 128-lane tile.

Ref analog: csrc reshape_and_cache (cache_kernels.cu) + the KV-cache
shape contract of AttentionBackend (vllm/v1/attention/backend.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Slot mapping convention: slot = block_id * block_size + offset, flat
# into [num_blocks * block_size). Padding tokens map into block 0 (the
# scheduler's null block) — harmlessly overwritten garbage.


def kv_cache_shape(num_blocks: int, block_size: int, num_kv_heads: int,
                   head_dim: int) -> tuple[int, int, int, int]:
    return (num_blocks, block_size, 2 * num_kv_heads, head_dim)


def split_kv(kv_cache: jax.Array) -> tuple[jax.Array, jax.Array]:
    """View K and V planes: [num_blocks, block_size, KH, D] each."""
    return kv_cache[:, :, 0::2, :], kv_cache[:, :, 1::2, :]


def write_kv_xla(
    kv_cache: jax.Array,  # [num_blocks, block_size, 2*KH, D]
    k: jax.Array,  # [T, KH, D]
    v: jax.Array,  # [T, KH, D]
    slot_mapping: jax.Array,  # [T] int32, flat slots
) -> jax.Array:
    """Scatter new K/V rows into the paged cache (functional; caller
    donates kv_cache under jit so XLA updates in place)."""
    num_blocks, block_size, kh2, d = kv_cache.shape
    flat = kv_cache.reshape(num_blocks * block_size, kh2, d)
    # Interleave k/v on the head axis: [T, 2*KH, D].
    kv = jnp.stack([k, v], axis=2).reshape(k.shape[0], kh2, d)
    flat = flat.at[slot_mapping].set(kv.astype(kv_cache.dtype))
    return flat.reshape(num_blocks, block_size, kh2, d)
