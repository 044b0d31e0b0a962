"""Quantized checkpoint loader: GPTQ/AWQ/AutoRound safetensors ->
device param pytree with packed quant leaves.

Ref analog: AutoGPTQConfig/AutoAWQConfig weight loading + repack
(vllm auto_gptq.py:97, auto_awq.py:171, MPLinearKernel
process_weights_after_loading). Pipeline per linear module:

    checkpoint tensors --decode (formats.py)--> canonical
    (qvals, scales, zeros) --pack (ref.py)--> device leaf
    {"qweight", "scales", "zbias"} consumed by quant/kernels.py.

Fusion (qkv, gate_up) concatenates along N after decoding; packing is
K-wise so fused parts stay independently correct. desc_act (g_idx)
activation permutations are supported on unfused projections only —
fused parts must share a trivial g_idx (sym AutoRound/GPTQ exports do).
"""

from __future__ import annotations

import numpy as np

from vllm_tpu.config import ModelConfig, QuantizationConfig
from vllm_tpu.loader.safetensors_loader import _iter_safetensors
from vllm_tpu.quant.formats import decode_awq, decode_gptq
from vllm_tpu.quant.ref import pack_w4_halfsplit
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_FUSE = {
    "self_attn.q_proj": ("qkv_proj", 0, 3),
    "self_attn.k_proj": ("qkv_proj", 1, 3),
    "self_attn.v_proj": ("qkv_proj", 2, 3),
    "mlp.gate_proj": ("gate_up_proj", 0, 2),
    "mlp.up_proj": ("gate_up_proj", 1, 2),
    "self_attn.o_proj": ("o_proj", 0, 1),
    "mlp.down_proj": ("down_proj", 0, 1),
}
_QUANT_TENSORS = (
    # GPTQ/AWQ/AutoRound
    "qweight", "qzeros", "scales", "g_idx",
    # compressed-tensors / fp8 checkpoints
    "weight_packed", "weight_scale", "weight_zero_point", "weight_shape",
    "weight_g_idx", "input_scale",
)
# Methods whose quantized tensor is plain "weight" (int8/float8 data).
_WEIGHT_IS_QUANT = ("ct_w8a8_int8", "ct_fp8", "fp8_ckpt")


def canonical_from_module(tensors: dict[str, np.ndarray],
                          quant: QuantizationConfig):
    """Decode one linear module's checkpoint tensors to canonical form.

    Returns (qvals [K,N], scales f32 [G,N], zeros [G,N], perm|None).
    """
    if quant.method in ("gptq", "auto_round"):
        # AutoRound sym GPTQ exports store true zeros (no -1 bias).
        zero_offset = 0 if (quant.method == "auto_round"
                            and quant.sym) else 1
        return decode_gptq(tensors["qweight"], tensors["qzeros"],
                           tensors["scales"], tensors.get("g_idx"),
                           quant.bits, zero_offset)
    if quant.method == "awq":
        q, s, z = decode_awq(tensors["qweight"], tensors["qzeros"],
                             tensors["scales"], quant.bits)
        return q, s, z, None
    if quant.method == "ct_wna16":
        from vllm_tpu.quant.ct_format import decode_ct_wna16
        wp = tensors["weight_packed"]
        shape = tensors.get("weight_shape")
        K = (int(shape[1]) if shape is not None else
             wp.shape[1] * (32 // quant.bits))
        return decode_ct_wna16(wp, tensors["weight_scale"],
                               tensors.get("weight_zero_point"),
                               quant.bits, K)
    raise ValueError(f"unsupported quant method {quant.method}")


def module_leaf(tensors: dict[str, np.ndarray],
                quant: QuantizationConfig) -> dict:
    """Decode one module's checkpoint tensors into a device leaf
    (numpy values; caller converts to jax)."""
    if quant.method in _WEIGHT_IS_QUANT:
        from vllm_tpu.quant.ct_format import decode_ct_w8
        qw, wscale = decode_ct_w8(tensors["weight"],
                                  tensors["weight_scale"])
        return {"qweight": qw, "wscale": wscale}
    q, s, z, perm = canonical_from_module(tensors, quant)
    return make_device_leaf(q, s, z, perm, quant.bits)


def make_device_leaf(qvals: np.ndarray, scales: np.ndarray,
                     zeros: np.ndarray, perm: np.ndarray | None,
                     bits: int) -> dict:
    """Canonical -> device leaf arrays (numpy; converted by caller)."""
    scales = scales.astype(np.float32)
    zbias = (-zeros.astype(np.float32)) * scales
    if bits == 4:
        leaf = {
            "qweight": pack_w4_halfsplit(qvals.astype(np.uint8)),
            "scales": scales,
            "zbias": zbias,
        }
    elif bits == 8:
        # Centered int8 storage: q - 128; fold the shift into zbias.
        leaf = {
            "qweight": (qvals.astype(np.int32) - 128).astype(np.int8),
            "scales": scales,
            "zbias": zbias + 128.0 * scales,
        }
    else:
        raise ValueError(f"bits={bits} unsupported (4 or 8)")
    if perm is not None:
        leaf["perm"] = perm.astype(np.int32)
    return leaf


def _concat_leaves(parts: list[dict]) -> dict:
    assert all(("perm" in p) == ("perm" in parts[0]) for p in parts)
    if "perm" in parts[0]:
        for p in parts[1:]:
            assert np.array_equal(p["perm"], parts[0]["perm"]), (
                "fused projections with differing g_idx permutations")
    out = {
        k: np.concatenate([p[k] for p in parts], axis=1)
        for k in parts[0] if k != "perm"
    }
    if "perm" in parts[0]:
        out["perm"] = parts[0]["perm"]
    return out


def _bnb4_leaf(tensors: dict, dtype) -> dict:
    """One bitsandbytes NF4 module -> our NF4 codebook leaf (ref:
    model_loader/bitsandbytes_loader.py semantics).

    bnb stores the weight flattened row-major [out, in], codes packed
    (first << 4) | second, per-64-block absmax over that flat order —
    with in % 64 == 0 each block lies along the in (K) axis of one
    output row, which is exactly our per-column K-group layout after a
    transpose. Double-quantized checkpoints carry uint8 absmax +
    nested_{absmax,quant_map} + an offset in the serialized
    quant_state."""
    import json

    import jax.numpy as jnp
    packed = np.asarray(tensors["weight"]).reshape(-1)
    qs_raw = tensors.get("quant_state.bitsandbytes__nf4")
    state = (json.loads(bytes(np.asarray(qs_raw).tobytes()))
             if qs_raw is not None else {})
    out, in_ = state.get("shape") or tensors["__shape__"]
    block = int(state.get("blocksize", 64))
    assert in_ % block == 0, "bnb block straddles rows (in % 64 != 0)"
    absmax = np.asarray(tensors["absmax"])
    if absmax.dtype == np.uint8:  # double quant
        nam = np.asarray(tensors["nested_absmax"], np.float32)
        nqm = np.asarray(tensors["nested_quant_map"], np.float32)
        nbs = int(state.get("nested_blocksize", 256))
        off = float(state.get("nested_offset", 0.0))
        deq = nqm[absmax.reshape(-1)]
        deq = deq * np.repeat(nam, nbs)[:deq.size] + off
        absmax = deq
    absmax = absmax.astype(np.float32).reshape(out, in_ // block)
    quant_map = np.asarray(tensors["quant_map"], np.float32)
    hi, lo = packed >> 4, packed & 0xF
    flat = np.empty(packed.size * 2, np.uint8)
    flat[0::2] = hi
    flat[1::2] = lo
    q = flat.reshape(out, in_).T  # [K, N]
    K, N = q.shape
    q2 = q.reshape(K // 2, 2, N)
    return {
        "qweight": jnp.asarray((q2[:, 0] | (q2[:, 1] << 4)).astype(
            np.uint8)),
        "scales": jnp.asarray(absmax.T.copy()),
        "codebook": jnp.asarray(quant_map),
    }


def _fuse_nf4(leaves: list[dict]) -> dict:
    import jax.numpy as jnp
    return {
        "qweight": jnp.concatenate([l["qweight"] for l in leaves],
                                   axis=1),
        "scales": jnp.concatenate([l["scales"] for l in leaves],
                                  axis=1),
        "codebook": leaves[0]["codebook"],
    }


def load_bnb4_params(model_path: str, cfg: ModelConfig) -> dict:
    """Pre-quantized bitsandbytes NF4 llama checkpoint -> param pytree
    with NF4 codebook leaves (served by the nf4 dequant path)."""
    import jax.numpy as jnp
    from vllm_tpu.loader.safetensors_loader import _iter_safetensors
    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    staging: dict[str, dict[str, np.ndarray]] = {}
    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {
                "weight": jnp.asarray(w).astype(dtype)}
            continue
        if name == "model.norm.weight":
            params["norm"] = jnp.asarray(w).astype(dtype)
            continue
        if name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {
                    "weight": jnp.asarray(np.asarray(w).T).astype(dtype)}
            continue
        if ".weight" in name and name.startswith("model.layers."):
            mod, _, sub = name.partition(".weight")
            sub = sub.lstrip(".")
            staging.setdefault(mod, {})[sub or "weight"] = w
            continue
        logger.warning("unmapped bnb weight %s", name)
    fused: dict[tuple[int, str], dict] = {}
    for mod, tensors in staging.items():
        rest = mod[len("model.layers."):]
        li_s, _, tail = rest.partition(".")
        li = int(li_s)
        if tail.endswith(("input_layernorm", "post_attention_layernorm")):
            layers[li][tail.rsplit(".", 1)[-1]] = jnp.asarray(
                tensors["weight"]).astype(dtype)
            continue
        leaf = _bnb4_leaf(tensors, dtype)
        short = tail.rsplit(".", 1)[-1]
        fused[(li, short)] = leaf
    for li in range(cfg.num_layers):
        lay = layers[li]
        lay["qkv_proj"] = _fuse_nf4([fused[(li, "q_proj")],
                                     fused[(li, "k_proj")],
                                     fused[(li, "v_proj")]])
        lay["o_proj"] = fused[(li, "o_proj")]
        lay["gate_up_proj"] = _fuse_nf4([fused[(li, "gate_proj")],
                                         fused[(li, "up_proj")]])
        lay["down_proj"] = fused[(li, "down_proj")]
    return params


def load_quantized_llama_params(model_path: str, cfg: ModelConfig,
                                quant: QuantizationConfig) -> dict:
    import jax.numpy as jnp
    if quant.method == "bnb4":
        return load_bnb4_params(model_path, cfg)

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    # (layer, module) -> {tensor_kind: array}
    staging: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    bias_staging: dict[tuple[int, str, int], np.ndarray] = {}
    lm_head_staging: dict[str, np.ndarray] = {}

    def to_jax(a, dt=dtype):
        return jnp.asarray(a).astype(dt)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name.startswith("lm_head."):
            kind = name.split(".")[-1]
            if kind == "weight" and not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
            elif kind in _QUANT_TENSORS:
                lm_head_staging[kind] = w
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            if tail == "input_layernorm.weight":
                layers[li]["input_layernorm"] = to_jax(w)
                continue
            if tail == "post_attention_layernorm.weight":
                layers[li]["post_attention_layernorm"] = to_jax(w)
                continue
            if tail == "self_attn.q_norm.weight":  # Qwen3 qk-norm
                layers[li]["q_norm"] = to_jax(w)
                continue
            if tail == "self_attn.k_norm.weight":
                layers[li]["k_norm"] = to_jax(w)
                continue
            mod, _, kind = tail.rpartition(".")
            if mod not in _FUSE:
                logger.warning("unmapped weight %s", name)
                continue
            if kind in _QUANT_TENSORS or (
                    kind == "weight"
                    and quant.method in _WEIGHT_IS_QUANT):
                staging.setdefault((li, mod), {})[kind] = w
            elif kind == "bias":
                bias_staging[(li, mod, 0)] = w
            elif kind == "weight":
                # Unquantized module inside a quantized checkpoint.
                leaf_name, _, _ = _FUSE[mod]
                layers[li].setdefault(leaf_name,
                                      {})[f"_part_weight_{mod}"] = w

    # Decode + pack per module, then fuse.
    fused_parts: dict[tuple[int, str], list] = {}
    for (li, mod), tensors in staging.items():
        leaf_name, slot, n_slots = _FUSE[mod]
        leaf = module_leaf(tensors, quant)
        fused_parts.setdefault((li, leaf_name), [None] * n_slots)[slot] = \
            leaf

    for (li, leaf_name), parts in fused_parts.items():
        assert all(p is not None for p in parts), (
            f"layer {li} {leaf_name}: missing quant parts")
        merged = _concat_leaves(parts)
        layers[li][leaf_name] = {
            k: jnp.asarray(v) for k, v in merged.items()
        }

    # Attach biases (qkv bias etc.).
    for (li, mod, _), b in bias_staging.items():
        leaf_name, slot, n_slots = _FUSE[mod]
        leaf = layers[li].setdefault(leaf_name, {})
        parts = leaf.setdefault("_bias_parts", [None] * n_slots)
        parts[slot] = b
    for li, layer in enumerate(layers):
        for leaf_name, leaf in list(layer.items()):
            if isinstance(leaf, dict) and "_bias_parts" in leaf:
                parts = leaf.pop("_bias_parts")
                if all(p is not None for p in parts):
                    leaf["bias"] = to_jax(np.concatenate(parts))

    if lm_head_staging and quant.lm_head_quantized:
        leaf = module_leaf(lm_head_staging, quant)
        params["lm_head"] = {k: jnp.asarray(v) for k, v in leaf.items()}

    return params
