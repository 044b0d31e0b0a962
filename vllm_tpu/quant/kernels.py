"""Quantized matmul dispatch + XLA reference implementations.

Device leaf formats (see quant/ref.py for packing):

- W4A16: {"qweight": uint8 [K/2, N] half-split packed,
          "scales": f32 [K/g, N], "zbias": f32 [K/g, N],
          "perm"?: int32 [K]}
  dequant: w = q * scale + zbias   (zbias = -zero * scale, fma form)
- W8A16: {"qweight": int8 [K, N] (centered, q - 2^(b-1)),
          "scales": f32 [K/g, N], "zbias": f32 [K/g, N]}

Bits are inferred from dtype: uint8 => nibble-packed 4-bit,
int8 => 8-bit. K comes from x, group size from K // scales.shape[0]
(nothing non-array rides in the pytree).

The ``perm`` leaf is GPTQ desc_act activation reordering (ref:
MPLinearKernel.py:22): x is gathered along K before the matmul.

Ref analog: the MPLinearKernel framework + marlin/machete GEMMs
(SURVEY.md §2.8) — here one canonical format + one Pallas kernel
(quant/pallas_w4a16.py) with this XLA path as fallback/ground-truth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.quant.ref import PACK_TILE_K
from vllm_tpu.utils import cdiv


def unpack_w4_halfsplit_jnp(packed: jax.Array,
                            tile_k: int = PACK_TILE_K) -> jax.Array:
    """[K/2, N] uint8 -> [K, N] uint8 (inverse of ref.pack_w4_halfsplit)."""
    K2, N = packed.shape
    half = tile_k // 2
    p = packed.reshape(K2 // half, half, N)
    lo = p & 0xF
    hi = p >> 4
    return jnp.stack([lo, hi], axis=1).reshape(K2 * 2, N)


def unpack_w2_jnp(packed: jax.Array) -> jax.Array:
    """[K/4, N] uint8 -> [K, N] uint8 (4 x 2-bit per byte, K-major)."""
    K4, N = packed.shape
    vals = jnp.stack([(packed >> (2 * j)) & 0x3 for j in range(4)],
                     axis=1)
    return vals.reshape(K4 * 4, N)


def unpack_w3_jnp(packed: jax.Array) -> jax.Array:
    """[3K/8, N] uint8 -> [K, N] uint8 (8 x 3-bit in 3 bytes)."""
    K38, N = packed.shape
    b = packed.reshape(K38 // 3, 3, N).astype(jnp.uint32)
    word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
    vals = jnp.stack([(word >> (3 * j)) & 0x7 for j in range(8)],
                     axis=1)
    return vals.astype(jnp.uint8).reshape(K38 // 3 * 8, N)


def dequant_weight_xla(leaf: dict, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the bf16 weight [K, N] (reference path)."""
    qw = leaf["qweight"]
    scales = leaf["scales"]
    # Symmetric leaves (prepare_weights drops the plane) => zb = -8*s.
    zbias = leaf.get("zbias")
    if zbias is None:
        zbias = -8.0 * scales.astype(jnp.float32)
    if qw.ndim == 4:  # tile-major prepack
        if "a8" in leaf:  # W4A8 straight-split (pallas_w4a8)
            from vllm_tpu.quant.pallas_w4a8 import unpack_w4a8
            qw = unpack_w4a8(qw)
        else:  # W4A16 quad-row interleave (pallas_w4a16)
            from vllm_tpu.quant.pallas_w4a16 import unpack_tiled
            qw = unpack_tiled(qw)
    bits = leaf["bits"].shape[0] if "bits" in leaf else None
    if bits == 2:
        q = unpack_w2_jnp(qw).astype(jnp.float32)
    elif bits == 3:
        q = unpack_w3_jnp(qw).astype(jnp.float32)
    elif qw.dtype == jnp.uint8:
        q = unpack_w4_halfsplit_jnp(qw).astype(jnp.float32)
    else:
        q = qw.astype(jnp.float32)
    K = q.shape[0]
    G = scales.shape[0]
    group = K // G
    s = jnp.repeat(scales.astype(jnp.float32), group, axis=0)
    zb = jnp.repeat(zbias.astype(jnp.float32), group, axis=0)
    return (q * s + zb).astype(compute_dtype)


def quantized_matmul_xla(x: jax.Array, leaf: dict) -> jax.Array:
    if "perm" in leaf:
        x = x[..., leaf["perm"]]
    if "a8" in leaf:
        # W4A8 semantics off-TPU: emulate the per-token int8
        # activation quantization so CPU evals (accuracy gate) measure
        # the format's real error (integer dots are exact in f32 at
        # these magnitudes, so this matches the Pallas kernel).
        xf = x.astype(jnp.float32)
        xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        inv = jnp.where(xs > 0, 1.0 / jnp.where(xs > 0, xs, 1.0), 0.0)
        xq = jnp.clip(jnp.round(xf * inv), -127.0, 127.0)
        w = dequant_weight_xla(leaf, jnp.float32)
        return ((xq @ w) * xs).astype(x.dtype)
    w = dequant_weight_xla(leaf, x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def dequant_nf4_xla(leaf: dict, compute_dtype=jnp.bfloat16) -> jax.Array:
    """bnb-class NF4 codebook dequant: nibble pairs -> 16-level lookup
    * per-block absmax scale (quant/online._quant_weight_nf4)."""
    qw = leaf["qweight"]  # [K/2, N], rows (2i, 2i+1) in (lo, hi)
    K2, N = qw.shape
    q = jnp.stack([qw & 0xF, qw >> 4], axis=1).reshape(2 * K2, N)
    wn = leaf["codebook"].astype(jnp.float32)[q]
    G = leaf["scales"].shape[0]
    s = jnp.repeat(leaf["scales"].astype(jnp.float32),
                   (2 * K2) // G, axis=0)
    return (wn * s).astype(compute_dtype)


def quantized_matmul(x: jax.Array, leaf: dict) -> jax.Array:
    """Production entry point used by ops/linear.py."""
    if "mx_scale" in leaf:  # OCP microscaling (MXFP4/MXFP8)
        from vllm_tpu.quant.mxfp import mxfp_matmul
        return mxfp_matmul(x, leaf)
    if "wscale" in leaf:  # dynamic activation quant (W8A8 int8 / fp8)
        from vllm_tpu.quant.online import w8a8_matmul
        return w8a8_matmul(x, leaf)
    if "codebook" in leaf:  # NF4 (bnb-class) codebook weights
        w = dequant_nf4_xla(leaf, x.dtype)
        return jnp.dot(x, w, preferred_element_type=x.dtype)
    from vllm_tpu.ops.dispatch import attention_backend
    x_k = x.shape[-1]
    if (attention_backend() == "pallas" and leaf["qweight"].dtype
            == jnp.uint8 and "bits" not in leaf
            and leaf["scales"].shape[0] * 128 == x_k):
        if "a8" in leaf:
            # QQQ-class W4A8: int8 activations on the int8 MXU path
            # (quant/pallas_w4a8.py; ref cutlass_w4a8/).
            from vllm_tpu.quant.pallas_w4a8 import w4a8_matmul
            if "perm" in leaf:
                x = x[..., leaf["perm"]]
            orig_shape = x.shape
            x2 = x.reshape(-1, orig_shape[-1])
            out = w4a8_matmul(x2, leaf["qweight"], leaf["scales"],
                              leaf.get("zbias"))
            return out.reshape(*orig_shape[:-1], out.shape[-1])
        from vllm_tpu.quant.pallas_w4a16 import w4a16_matmul
        if "perm" in leaf:
            # desc_act: the loader already sorted qweight rows by
            # group, so the fused kernel applies after gathering x
            # (the reference's g_idx act-reorder, MPLinearKernel.py:22).
            x = x[..., leaf["perm"]]
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        out = w4a16_matmul(x2, leaf["qweight"], leaf["scales"],
                           leaf.get("zbias"))
        return out.reshape(*orig_shape[:-1], out.shape[-1])
    return quantized_matmul_xla(x, leaf)


def _ep_size() -> int:
    from vllm_tpu.parallel.mesh import AXIS_EP, axis_size
    return axis_size(AXIS_EP)


def prepare_weights(params):
    """One-time device-side weight repack for the active backend (the
    analog of process_weights_after_loading, ref MPLinearKernel.py:57):
    W4A16 leaves gain the tile-major layout the Pallas kernel streams
    contiguously. No-op off-TPU or for non-4bit leaves."""
    from vllm_tpu.ops.dispatch import attention_backend
    if attention_backend() != "pallas":
        return params
    from vllm_tpu.quant.pallas_w4a16 import pick_bn, prepack_tiled

    def visit(node, key=None):
        if isinstance(node, dict):
            qw = node.get("qweight")
            if (qw is not None and getattr(qw, "dtype", None) == jnp.uint8
                    and qw.ndim == 2
                    and "mx_scale" not in node and "scales" in node
                    and qw.shape[0] % 128 == 0
                    and node["scales"].shape[0] * 64 == qw.shape[0]):
                if key == "lm_head" and pick_bn(qw.shape[1], 32) < 1024:
                    # Vocab widths (e.g. 32000) tile terribly (bn=256
                    # -> 125 tiny grid steps, measured 3x the stream
                    # floor). Pad N to a 2048 multiple; the padded
                    # columns decode to logit 0 (scales/zbias 0) and
                    # compute_logits slices back to vocab_size.
                    n = qw.shape[1]
                    n_pad = cdiv(n, 2048) * 2048 - n
                    node = dict(node)
                    node["qweight"] = jnp.pad(qw, ((0, 0), (0, n_pad)))
                    for k2 in ("scales", "zbias"):
                        node[k2] = jnp.pad(node[k2],
                                           ((0, 0), (0, n_pad)))
                    qw = node["qweight"]
                bn = pick_bn(qw.shape[1], 32)
                if qw.shape[1] % bn == 0:
                    node = dict(node)
                    if "a8" in node:  # W4A8 straight-split layout
                        from vllm_tpu.quant.pallas_w4a8 import \
                            prepack_w4a8
                        pack = prepack_w4a8
                    else:
                        pack = prepack_tiled
                    node["qweight"] = jax.jit(
                        pack, static_argnums=1)(qw, bn)
                    # bf16 scale stream: scales/zbias are ~19% of the
                    # decode weight bytes at f32; bf16 halves that for
                    # ~0.4% relative scale error (small next to the
                    # int4 grid). The kernel upcasts in the epilogue.
                    # Symmetric checkpoints (GPTQ/AutoRound sym=true:
                    # all zeros == 8 => zbias == -8*scales exactly; the
                    # loader's -zeros*scales and the *8 here are both
                    # exact in f32) drop the zbias plane entirely — it
                    # is never streamed; the kernel folds -8*s into its
                    # epilogue constant. ~2.7% of the decode step's HBM
                    # bytes at 8B INT4. Checked BEFORE the bf16 scale
                    # cast (the identity holds in the checkpoint dtype).
                    if "zbias" in node and bool(
                            jnp.all(node["zbias"] == -8.0 *
                                    node["scales"].astype(
                                        node["zbias"].dtype))):
                        del node["zbias"]
                    node["scales"] = node["scales"].astype(jnp.bfloat16)
                    if "zbias" in node:
                        node["zbias"] = node["zbias"].astype(
                            jnp.bfloat16)
            elif (qw is not None
                  and getattr(qw, "dtype", None) == jnp.uint8
                  and qw.ndim == 3 and qw.shape[1] % 128 == 0
                  and _ep_size() == 1):
                # Under expert parallelism the grouped Pallas layout is
                # skipped: ops/moe._ep_moe dequantizes the (ep-sharded)
                # untiled leaves locally inside shard_map.
                # Stacked MoE experts [NE, K/2, N] -> tile-major 5-D.
                from vllm_tpu.quant.pallas_moe import \
                    prepack_tiled_experts
                bn = pick_bn(qw.shape[2], 32)
                if qw.shape[2] % bn == 0:
                    node = dict(node)
                    node["qweight"] = jax.jit(
                        prepack_tiled_experts, static_argnums=1)(qw, bn)
            return {k: visit(v, k) if isinstance(v, (dict, list)) else v
                    for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v, key) if isinstance(v, (dict, list)) else v
                    for v in node]
        return node

    return visit(params)
