"""HF safetensors checkpoint -> vllm_tpu param pytree.

Ref analog: vllm/model_executor/model_loader/default_loader.py
(safetensors streaming) + each model's ``load_weights`` stacking
q/k/v -> qkv and gate/up -> gate_up (ref: llama.py load_weights
stacked_params_mapping).

Weight-layout convention: our linears store [in_features, out_features]
(x @ W, no transpose at run time); HF stores [out, in] so dense weights
transpose once at load. Fusion happens eagerly on host numpy arrays —
memory cost is one layer at a time (we stream tensor-by-tensor).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from vllm_tpu.config import ModelConfig, QuantizationConfig
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

# HF name suffix -> (our leaf name, slot index in fusion group)
_FUSED = {
    "self_attn.q_proj": ("qkv_proj", 0),
    "self_attn.k_proj": ("qkv_proj", 1),
    "self_attn.v_proj": ("qkv_proj", 2),
    "mlp.gate_proj": ("gate_up_proj", 0),
    "mlp.up_proj": ("gate_up_proj", 1),
}
_DIRECT = {
    "self_attn.o_proj": "o_proj",
    "mlp.down_proj": "down_proj",
    # phi3-style checkpoints ship qkv/gate_up already fused
    "self_attn.qkv_proj": "qkv_proj",
    "mlp.gate_up_proj": "gate_up_proj",
}


def _iter_safetensors(model_path: str):
    """Yield (name, numpy array) across all shards."""
    from safetensors import safe_open
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {model_path}")
    index = os.path.join(model_path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            wmap = json.load(f)["weight_map"]
        shards = sorted(set(wmap.values()))
        files = [os.path.join(model_path, s) for s in shards]
    for fn in files:
        with safe_open(fn, framework="np") as f:
            names = list(f.keys())
            for name in names:
                try:
                    yield name, f.get_tensor(name)
                except Exception:
                    # dtypes numpy can't express natively (float8):
                    # reread via torch and reinterpret with ml_dtypes.
                    yield name, _get_tensor_torch(fn, name)


def _get_tensor_torch(fn: str, name: str):
    import ml_dtypes
    import numpy as _np
    import torch
    from safetensors import safe_open as _so
    _F8 = {
        torch.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
        torch.float8_e5m2: ml_dtypes.float8_e5m2,
    }
    with _so(fn, framework="pt") as f:
        t = f.get_tensor(name)
    if t.dtype in _F8:
        return t.view(torch.uint8).numpy().view(_F8[t.dtype])
    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return _np.asarray(t.numpy())


def load_llama_params(
    model_path: str,
    cfg: ModelConfig,
    quant: QuantizationConfig | None = None,
) -> dict:
    """Load a Llama-family checkpoint into the functional pytree.

    Quantized checkpoints (GPTQ/AWQ/AutoRound) route through
    vllm_tpu.quant.loader instead; this handles fp16/bf16. MoE
    (Mixtral) checkpoints branch to the MoE mapper.
    """
    import jax.numpy as jnp

    if quant is not None and quant.enabled:
        from vllm_tpu.quant.loader import load_quantized_llama_params
        return load_quantized_llama_params(model_path, cfg, quant)
    if cfg.architecture == "Qwen2VLForConditionalGeneration":
        return _load_qwen2_vl_params(model_path, cfg)
    if cfg.vision is not None:
        return _load_llava_params(model_path, cfg)
    if cfg.kv_lora_rank:
        return _load_deepseek_params(model_path, cfg)
    if cfg.architecture in ("BertModel", "RobertaModel",
                            "XLMRobertaModel",
                            "BertForSequenceClassification",
                            "RobertaForSequenceClassification",
                            "XLMRobertaForSequenceClassification"):
        return _load_bert_params(model_path, cfg)
    if cfg.architecture == "WhisperForConditionalGeneration":
        return _load_whisper_params(model_path, cfg)
    if cfg.architecture == "Qwen3NextForCausalLM":
        return _load_qwen3_next_params(model_path, cfg)
    if cfg.mamba_dt_rank:
        return _load_mamba1_params(model_path, cfg)
    if cfg.mamba_num_heads and cfg.layer_types is None:
        return _load_mamba2_params(model_path, cfg)
    if cfg.layer_types is not None and cfg.mamba_num_heads:
        return _load_bamba_params(model_path, cfg)
    if cfg.architecture in ("Qwen2MoeForCausalLM",
                            "Qwen3MoeForCausalLM"):
        return _load_qwen2_moe_params(model_path, cfg)
    if cfg.architecture == "GptOssForCausalLM":
        return _load_gpt_oss_params(model_path, cfg)
    if cfg.num_experts > 0:
        return _load_mixtral_params(model_path, cfg)

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    # Fusion staging: (layer, leaf) -> {slot: np.ndarray}
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}

    def to_jax(a: np.ndarray):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax(w)
            elif tail == "pre_feedforward_layernorm.weight":  # gemma2/3
                layer["pre_feedforward_layernorm"] = to_jax(w)
            elif tail == "post_feedforward_layernorm.weight":
                layer["post_feedforward_layernorm"] = to_jax(w)
            elif tail == "self_attn.q_norm.weight":  # Qwen3/Cohere
                layer["q_norm"] = to_jax(w)
            elif tail == "self_attn.k_norm.weight":
                layer["k_norm"] = to_jax(w)
            elif tail == "post_self_attn_layernorm.weight":  # GLM-4
                layer["post_self_attn_layernorm"] = to_jax(w)
            elif tail == "post_mlp_layernorm.weight":
                layer["post_mlp_layernorm"] = to_jax(w)
            else:
                mod, _, kind = tail.rpartition(".")  # kind: weight|bias
                if mod in _DIRECT:
                    leaf = layer.setdefault(_DIRECT[mod], {})
                    if kind == "weight":
                        leaf["weight"] = to_jax(w.T)
                    else:
                        leaf["bias"] = to_jax(w)
                elif mod in _FUSED:
                    leaf_name, slot = _FUSED[mod]
                    pending.setdefault((li, leaf_name, kind),
                                       {})[slot] = w
                else:
                    logger.warning("unmapped weight %s", name)
        elif name.startswith("model.rotary_emb"):
            pass  # computed, not loaded
        else:
            logger.warning("unmapped weight %s", name)

    # Finish fusions: concat along output dim then transpose.
    for (li, leaf_name, kind), slots in pending.items():
        n_slots = 3 if leaf_name == "qkv_proj" else 2
        assert len(slots) == n_slots, (
            f"layer {li} {leaf_name}.{kind}: missing parts "
            f"{set(range(n_slots)) - set(slots)}")
        cat = np.concatenate([slots[i] for i in range(n_slots)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        if kind == "weight":
            leaf["weight"] = to_jax(cat.T)
        else:
            leaf["bias"] = to_jax(cat)

    _validate(params, cfg)
    return params


def _load_gpt_oss_params(model_path: str, cfg: ModelConfig) -> dict:
    """GPT-OSS mapping: q/k/v (+bias) -> fused qkv_proj, per-head
    sinks, mlp.router -> router, stacked biased experts kept in the
    checkpoint's [NE, E, 2I] (interleaved gate/up) layout
    (models/gpt_oss.py schema; ref: vllm gpt_oss.py load_weights)."""
    import jax.numpy as jnp
    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    pending: dict[tuple[int, str], dict[int, np.ndarray]] = {}

    def to_jax(a: np.ndarray):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax(w)
            elif tail == "self_attn.sinks":
                layer["sinks"] = jnp.asarray(w).astype(jnp.float32)
            elif tail == "self_attn.o_proj.weight":
                layer.setdefault("o_proj", {})["weight"] = to_jax(w.T)
            elif tail == "self_attn.o_proj.bias":
                layer.setdefault("o_proj", {})["bias"] = to_jax(w)
            elif tail == "mlp.router.weight":
                layer.setdefault("router", {})["weight"] = to_jax(w.T)
            elif tail == "mlp.router.bias":
                layer.setdefault("router", {})["bias"] = to_jax(w)
            elif tail == "mlp.experts.gate_up_proj":
                layer.setdefault("experts", {})["gate_up"] = to_jax(w)
            elif tail == "mlp.experts.gate_up_proj_bias":
                layer.setdefault("experts",
                                 {})["gate_up_bias"] = to_jax(w)
            elif tail == "mlp.experts.down_proj":
                layer.setdefault("experts", {})["down"] = to_jax(w)
            elif tail == "mlp.experts.down_proj_bias":
                layer.setdefault("experts", {})["down_bias"] = to_jax(w)
            else:
                mod, _, kind = tail.rpartition(".")
                slot = {"self_attn.q_proj": 0, "self_attn.k_proj": 1,
                        "self_attn.v_proj": 2}.get(mod)
                if slot is None:
                    logger.warning("unmapped weight %s", name)
                else:
                    pending.setdefault((li, kind), {})[slot] = w
        else:
            logger.warning("unmapped weight %s", name)

    for (li, kind), slots in pending.items():
        assert len(slots) == 3, (li, kind, sorted(slots))
        cat = np.concatenate([slots[i] for i in range(3)], axis=0)
        leaf = layers[li].setdefault("qkv_proj", {})
        leaf[kind] = to_jax(cat.T if kind == "weight" else cat)

    return params


def _load_mixtral_params(model_path: str, cfg: ModelConfig) -> dict:
    """Mixtral mapping: block_sparse_moe.gate -> router,
    experts.{e}.{w1,w3} -> stacked fused w_gate_up, w2 -> w_down.
    Ref analog: mixtral.py load_weights expert stacking."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    E = cfg.num_experts
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}
    # (layer, expert) -> {"w1"|"w2"|"w3": array}
    experts: dict[tuple[int, int], dict[str, np.ndarray]] = {}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax(w)
            elif tail == "block_sparse_moe.gate.weight":
                layer["router"] = {"weight": to_jax(w.T)}
            elif tail.startswith("block_sparse_moe.experts."):
                parts = tail.split(".")
                e, which = int(parts[2]), parts[3]
                experts.setdefault((li, e), {})[which] = w
            else:
                mod, _, kind = tail.rpartition(".")
                if mod in _DIRECT:
                    leaf = layer.setdefault(_DIRECT[mod], {})
                    leaf["weight" if kind == "weight" else "bias"] = \
                        to_jax(w.T if kind == "weight" else w)
                elif mod in _FUSED:
                    leaf_name, slot = _FUSED[mod]
                    pending.setdefault((li, leaf_name, kind), {})[slot] = w

    for (li, leaf_name, kind), slots in pending.items():
        n_slots = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n_slots)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            cat.T if kind == "weight" else cat)

    # Stack experts: w1 (gate) [I,H], w3 (up) [I,H], w2 (down) [H,I].
    for li in range(cfg.num_layers):
        gu, dn = [], []
        for e in range(E):
            ws = experts.get((li, e))
            assert ws is not None and set(ws) == {"w1", "w2", "w3"}, (
                f"layer {li} expert {e}: incomplete {set(ws or ())}")
            gu.append(np.concatenate([ws["w1"].T, ws["w3"].T], axis=1))
            dn.append(ws["w2"].T)
        layers[li]["w_gate_up"] = to_jax(np.stack(gu))
        layers[li]["w_down"] = to_jax(np.stack(dn))
    return params


def _load_deepseek_params(model_path: str, cfg: ModelConfig) -> dict:
    """DeepSeek-V2/V3 mapping (MLA leaves + mlp.experts stacking +
    shared experts; ref analog: deepseek_v2.py load_weights)."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    # (layer, expert) -> {"gate"|"up"|"down": array}
    experts: dict[tuple[int, int], dict[str, np.ndarray]] = {}
    # (layer, shared?) -> {"gate"|"up": array} for gate_up fusion
    pending_gu: dict[int, dict[str, np.ndarray]] = {}

    norms = {
        "input_layernorm.weight": "input_layernorm",
        "post_attention_layernorm.weight": "post_attention_layernorm",
        "self_attn.q_a_layernorm.weight": "q_a_layernorm",
        "self_attn.kv_a_layernorm.weight": "kv_a_layernorm",
    }
    attn_linears = {
        "self_attn.q_proj": "q_proj",
        "self_attn.q_a_proj": "q_a_proj",
        "self_attn.q_b_proj": "q_b_proj",
        "self_attn.kv_a_proj_with_mqa": "kv_a_proj_with_mqa",
        "self_attn.kv_b_proj": "kv_b_proj",
        "self_attn.o_proj": "o_proj",
    }

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail in norms:
                layer[norms[tail]] = to_jax(w)
                continue
            mod, _, kind = tail.rpartition(".")
            if tail.startswith("self_attn.indexer."):
                # DeepSeek-V3.2 lightning indexer (ref:
                # models/deepseek_v32/attention.py wq_b /
                # wk_weights_proj / k_norm).
                sub = tail[len("self_attn.indexer."):]
                idx = layer.setdefault("indexer", {})
                smod, _, skind = sub.rpartition(".")
                if smod in ("wq_b", "wk_weights_proj"):
                    idx.setdefault(smod, {})[skind] = to_jax(
                        w.T if skind == "weight" else w)
                elif smod == "k_norm":
                    idx.setdefault("k_norm", {})[skind] = to_jax(w)
                else:
                    logger.warning("unmapped weight %s", name)
            elif mod in attn_linears:
                leaf = layer.setdefault(attn_linears[mod], {})
                leaf["weight" if kind == "weight" else "bias"] = to_jax(
                    w.T if kind == "weight" else w)
            elif tail == "mlp.gate.weight":
                layer.setdefault("router", {})["weight"] = to_jax(w.T)
            elif tail == "mlp.gate.e_score_correction_bias":
                layer.setdefault("router",
                                 {})["e_score_correction_bias"] = (
                    jnp.asarray(w).astype(jnp.float32))
            elif tail.startswith("mlp.experts."):
                parts = tail.split(".")
                e, which = int(parts[2]), parts[3]
                experts.setdefault((li, e), {})[which] = w
            elif tail.startswith(("mlp.shared_experts.", "mlp.")):
                # dense-layer MLP and shared experts both land on the
                # layer's gate_up_proj/down_proj leaves.
                which = tail.split(".")[-2]
                if which == "down_proj":
                    layer["down_proj"] = {"weight": to_jax(w.T)}
                else:
                    pending_gu.setdefault(li, {})[which] = w
            else:
                logger.warning("unmapped weight %s", name)

    for li, parts in pending_gu.items():
        cat = np.concatenate([parts["gate_proj"], parts["up_proj"]],
                             axis=0)
        layers[li]["gate_up_proj"] = {"weight": to_jax(cat.T)}

    for li in range(cfg.num_layers):
        per_layer = sorted(
            (e for (l2, e) in experts if l2 == li))
        if not per_layer:
            continue
        gu, dn = [], []
        for e in per_layer:
            ws = experts[(li, e)]
            gu.append(np.concatenate([ws["gate_proj"].T,
                                      ws["up_proj"].T], axis=1))
            dn.append(ws["down_proj"].T)
        layers[li]["w_gate_up"] = to_jax(np.stack(gu))
        layers[li]["w_down"] = to_jax(np.stack(dn))
    return params


def _load_llava_params(model_path: str, cfg: ModelConfig) -> dict:
    """LLaVA mapping: vision tower (conv kernel flattened for the
    matmul patchify) + projector + llama language model."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    vL = cfg.vision["num_layers"]
    vlayers: list[dict] = [dict() for _ in range(vL)]
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {
        "layers": layers,
        "vision_tower": {"layers": vlayers},
        "projector": {},
    }
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    def put_dense(d, key, kind, w):
        leaf = d.setdefault(key, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            w.T if kind == "weight" else w)

    vt = params["vision_tower"]
    for name, w in _iter_safetensors(model_path):
        if name.startswith("model."):
            name = name[len("model."):]
        if name.startswith("language_model."):
            rest = name[len("language_model."):]
            if rest.startswith("model."):  # legacy nested naming
                rest = rest[len("model."):]
            if rest == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    params["lm_head"] = {"weight": to_jax(w.T)}
            elif rest == "embed_tokens.weight":
                params["embed_tokens"] = {"weight": to_jax(w)}
            elif rest == "norm.weight":
                params["norm"] = to_jax(w)
            elif rest.startswith("layers."):
                idx_s, _, tail = rest[len("layers."):].partition(".")
                li = int(idx_s)
                layer = layers[li]
                if tail == "input_layernorm.weight":
                    layer["input_layernorm"] = to_jax(w)
                elif tail == "post_attention_layernorm.weight":
                    layer["post_attention_layernorm"] = to_jax(w)
                else:
                    mod, _, kind = tail.rpartition(".")
                    if mod in _DIRECT:
                        put_dense(layer, _DIRECT[mod], kind, w)
                    elif mod in _FUSED:
                        leaf_name, slot = _FUSED[mod]
                        pending.setdefault((li, leaf_name, kind),
                                           {})[slot] = w
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("multi_modal_projector."):
            rest = name[len("multi_modal_projector."):]
            mod, _, kind = rest.rpartition(".")
            put_dense(params["projector"], mod, kind, w)
        elif name.startswith("vision_tower.vision_model."):
            rest = name[len("vision_tower.vision_model."):]
            if rest == "embeddings.class_embedding":
                vt["class_embedding"] = to_jax(w)
            elif rest == "embeddings.patch_embedding.weight":
                # conv [Ev, 3, P, P] -> [3*P*P, Ev]
                ev = w.shape[0]
                vt["patch_embedding"] = {
                    "weight": to_jax(w.reshape(ev, -1).T)
                }
            elif rest == "embeddings.position_embedding.weight":
                vt["position_embedding"] = to_jax(w)
            elif rest.startswith("pre_layrnorm."):
                leaf = vt.setdefault("pre_layernorm", {})
                leaf["scale" if rest.endswith("weight") else
                     "bias"] = to_jax(w)
            elif rest.startswith("post_layernorm."):
                pass  # feature extraction uses raw hidden states
            elif rest.startswith("encoder.layers."):
                idx_s, _, tail = rest[len("encoder.layers."):].partition(
                    ".")
                vlayer = vlayers[int(idx_s)]
                if tail.startswith(("layer_norm1.", "layer_norm2.")):
                    key = tail.split(".")[0]
                    leaf = vlayer.setdefault(key, {})
                    leaf["scale" if tail.endswith("weight") else
                         "bias"] = to_jax(w)
                else:
                    mod, _, kind = tail.rpartition(".")
                    mod = mod.replace("self_attn.", "").replace(
                        "mlp.", "")
                    put_dense(vlayer, mod, kind, w)
        else:
            logger.warning("unmapped weight %s", name)

    for (li, leaf_name, kind), slots in pending.items():
        n_slots = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n_slots)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            cat.T if kind == "weight" else cat)
    return params


def _load_qwen2_vl_params(model_path: str, cfg: ModelConfig) -> dict:
    """Qwen2-VL mapping: ViT tower (Conv3d kernel flattened for the
    matmul patch embed) + merger + Qwen2 language model (qkv bias).
    Handles both flat (``visual.*`` / ``model.*``) and nested
    (``model.visual.*`` / ``model.language_model.*``) HF layouts."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    vL = cfg.vision["depth"]
    blocks: list[dict] = [dict() for _ in range(vL)]
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {
        "layers": layers,
        "visual": {"blocks": blocks, "merger": {}},
    }
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    def put_dense(d, key, kind, w):
        leaf = d.setdefault(key, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            w.T if kind == "weight" else w)

    def put_ln(d, key, kind, w):
        leaf = d.setdefault(key, {})
        leaf["scale" if kind == "weight" else "bias"] = to_jax(w)

    vt = params["visual"]
    for name, w in _iter_safetensors(model_path):
        if name.startswith("model.visual."):
            name = name[len("model."):]
        elif name.startswith("model.language_model."):
            name = "model." + name[len("model.language_model."):]
        if name.startswith("visual."):
            rest = name[len("visual."):]
            if rest == "patch_embed.proj.weight":
                # Conv3d [Ev, C, tp, ps, ps] -> [C*tp*ps*ps, Ev]
                ev = w.shape[0]
                vt["patch_embed"] = {"weight": to_jax(w.reshape(ev, -1).T)}
            elif rest.startswith("merger.ln_q."):
                put_ln(vt["merger"], "ln_q", rest.rsplit(".", 1)[1], w)
            elif rest.startswith("merger.mlp."):
                _, idx_s, kind = rest[len("merger."):].split(".")
                put_dense(vt["merger"], f"mlp_{idx_s}", kind, w)
            elif rest.startswith("blocks."):
                idx_s, _, tail = rest[len("blocks."):].partition(".")
                blk = blocks[int(idx_s)]
                mod, _, kind = tail.rpartition(".")
                if mod in ("norm1", "norm2"):
                    put_ln(blk, mod, kind, w)
                else:
                    mod = mod.replace("attn.", "").replace("mlp.", "")
                    put_dense(blk, mod, kind, w)
            else:
                logger.warning("unmapped weight %s", name)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name.startswith("model.layers."):
            idx_s, _, tail = name[len("model.layers."):].partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax(w)
            else:
                mod, _, kind = tail.rpartition(".")
                if mod in _DIRECT:
                    put_dense(layer, _DIRECT[mod], kind, w)
                elif mod in _FUSED:
                    leaf_name, slot = _FUSED[mod]
                    pending.setdefault((li, leaf_name, kind),
                                       {})[slot] = w
                else:
                    logger.warning("unmapped weight %s", name)
        elif name.startswith("model.rotary_emb"):
            pass
        else:
            logger.warning("unmapped weight %s", name)

    for (li, leaf_name, kind), slots in pending.items():
        n_slots = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n_slots)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            cat.T if kind == "weight" else cat)
    return params


def _load_qwen2_moe_params(model_path: str, cfg: ModelConfig) -> dict:
    """Qwen2/3-MoE mapping: expert stacking + sigmoid-gated shared
    expert (mlp.shared_expert[_gate]) + qkv bias / qk-norm."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}
    experts: dict[tuple[int, int], dict[str, np.ndarray]] = {}
    shared_gu: dict[int, dict[str, np.ndarray]] = {}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax(w)
            elif tail == "self_attn.q_norm.weight":  # qwen3-moe
                layer["q_norm"] = to_jax(w)
            elif tail == "self_attn.k_norm.weight":
                layer["k_norm"] = to_jax(w)
            elif tail == "mlp.gate.weight":
                layer["router"] = {"weight": to_jax(w.T)}
            elif tail == "mlp.shared_expert_gate.weight":
                layer["shared_gate"] = {"weight": to_jax(w.T)}
            elif tail.startswith("mlp.experts."):
                parts = tail.split(".")
                experts.setdefault((li, int(parts[2])),
                                   {})[parts[3]] = w
            elif tail.startswith(("mlp.shared_expert.", "mlp.")):
                which = tail.split(".")[-2]
                if which == "down_proj":
                    layer["down_proj"] = {"weight": to_jax(w.T)}
                else:
                    shared_gu.setdefault(li, {})[which] = w
            else:
                mod, _, kind = tail.rpartition(".")
                if mod in _DIRECT:
                    leaf = layer.setdefault(_DIRECT[mod], {})
                    leaf["weight" if kind == "weight" else "bias"] = \
                        to_jax(w.T if kind == "weight" else w)
                elif mod in _FUSED:
                    leaf_name, slot = _FUSED[mod]
                    pending.setdefault((li, leaf_name, kind),
                                       {})[slot] = w
                else:
                    logger.warning("unmapped weight %s", name)

    for li, parts in shared_gu.items():
        cat = np.concatenate([parts["gate_proj"], parts["up_proj"]],
                             axis=0)
        layers[li]["gate_up_proj"] = {"weight": to_jax(cat.T)}
    for (li, leaf_name, kind), slots in pending.items():
        n_slots = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n_slots)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            cat.T if kind == "weight" else cat)
    for li in range(cfg.num_layers):
        ids = sorted(e for (l2, e) in experts if l2 == li)
        if not ids:
            continue
        gu, dn = [], []
        for e in ids:
            ws = experts[(li, e)]
            gu.append(np.concatenate([ws["gate_proj"].T,
                                      ws["up_proj"].T], axis=1))
            dn.append(ws["down_proj"].T)
        layers[li]["w_gate_up"] = to_jax(np.stack(gu))
        layers[li]["w_down"] = to_jax(np.stack(dn))
    return params


def _load_qwen3_next_params(model_path: str, cfg: ModelConfig) -> dict:
    """Qwen3-Next mapping (ref analog: qwen3_next.py load_weights):
    GDN mixer leaves on linear_attention layers (conv1d [C,1,K] ->
    conv_w [K,C]), split q/k/v on full_attention layers (q_proj is
    2x-wide: [q | gate] per head), qwen2-moe expert stacking."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    experts: dict[tuple[int, int], dict[str, np.ndarray]] = {}
    shared_gu: dict[int, dict[str, np.ndarray]] = {}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    gdn_map = {"in_proj_qkvz": "in_proj_qkvz", "in_proj_ba":
               "in_proj_ba", "out_proj": "out_proj"}

    def to_jax_norm(a):
        # Qwen3Next zero-centered RMSNorm: stored weight w applies as
        # (1 + w) (modeling_qwen3_next.Qwen3NextRMSNorm). Folded here
        # so the serving rms_norm stays the plain multiply. The GDN
        # gated norm (norm.weight -> gdn_norm) is NOT zero-centered.
        return jnp.asarray(np.asarray(a) + 1.0).astype(dtype)
    attn_map = {"q_proj": "q_proj", "k_proj": "k_proj",
                "v_proj": "v_proj", "o_proj": "o_proj"}
    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.norm.weight":
            params["norm"] = to_jax_norm(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax_norm(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax_norm(w)
            elif tail.startswith("linear_attn."):
                part = tail[len("linear_attn."):]
                mod, _, _kind = part.rpartition(".")
                if mod in gdn_map:
                    layer[gdn_map[mod]] = {"weight": to_jax(w.T)}
                elif part == "conv1d.weight":
                    layer["conv_w"] = to_jax(w[:, 0, :].T)
                elif part in ("A_log", "dt_bias"):
                    layer[part] = jnp.asarray(w).astype(jnp.float32)
                elif part == "norm.weight":
                    layer["gdn_norm"] = to_jax(w)
                else:
                    logger.warning("unmapped weight %s", name)
            elif tail.startswith("self_attn."):
                part = tail[len("self_attn."):]
                mod, _, _kind = part.rpartition(".")
                if mod in attn_map:
                    layer[attn_map[mod]] = {"weight": to_jax(w.T)}
                elif part == "q_norm.weight":
                    layer["q_norm"] = to_jax_norm(w)
                elif part == "k_norm.weight":
                    layer["k_norm"] = to_jax_norm(w)
                else:
                    logger.warning("unmapped weight %s", name)
            elif tail == "mlp.gate.weight":
                layer["router"] = {"weight": to_jax(w.T)}
            elif tail == "mlp.shared_expert_gate.weight":
                layer["shared_gate"] = {"weight": to_jax(w.T)}
            elif tail.startswith("mlp.experts."):
                parts = tail.split(".")
                experts.setdefault((li, int(parts[2])),
                                   {})[parts[3]] = w
            elif tail.startswith("mlp.shared_expert."):
                which = tail.split(".")[-2]
                if which == "down_proj":
                    layer["down_proj"] = {"weight": to_jax(w.T)}
                else:
                    shared_gu.setdefault(li, {})[which] = w
            else:
                logger.warning("unmapped weight %s", name)
        else:
            logger.warning("unmapped weight %s", name)
    for li, parts in shared_gu.items():
        cat = np.concatenate([parts["gate_proj"], parts["up_proj"]],
                             axis=0)
        layers[li]["gate_up_proj"] = {"weight": to_jax(cat.T)}
    for li in range(cfg.num_layers):
        ids = sorted(e for (l2, e) in experts if l2 == li)
        if not ids:
            continue
        gu, dn = [], []
        for e in ids:
            ws = experts[(li, e)]
            gu.append(np.concatenate([ws["gate_proj"].T,
                                      ws["up_proj"].T], axis=1))
            dn.append(ws["down_proj"].T)
        layers[li]["w_gate_up"] = to_jax(np.stack(gu))
        layers[li]["w_down"] = to_jax(np.stack(dn))
    return params


def _load_whisper_params(model_path: str, cfg: ModelConfig) -> dict:
    """Whisper mapping (HF model.encoder/model.decoder names; ref
    analog: whisper.py load_weights). Self-attn q/k/v fuse (k has no
    bias in HF - zero-filled); cross-attn stays split because cross-K/V
    project encoder states at admission, not decode time."""
    import numpy as np

    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    L, EL = cfg.num_layers, cfg.audio["encoder_layers"]
    E = cfg.hidden_size
    dec_layers: list[dict] = [dict() for _ in range(L)]
    enc_layers: list[dict] = [dict() for _ in range(EL)]
    enc: dict = {"layers": enc_layers}
    params: dict = {"layers": dec_layers, "audio_encoder": enc}
    qkv: dict[tuple, dict] = {}

    def to_jax(a):
        return jnp.asarray(np.asarray(a)).astype(dtype)

    def put_dense(d, key, wk, w):
        d.setdefault(key, {})[wk] = (to_jax(w.T) if wk == "weight"
                                     else to_jax(w))

    ln_map = {"self_attn_layer_norm": "attn_ln",
              "final_layer_norm": "final_ln"}
    dec_ln_map = {"self_attn_layer_norm": "self_ln",
                  "encoder_attn_layer_norm": "cross_ln",
                  "final_layer_norm": "fc_ln"}
    cross_map = {"q_proj": "cross_q", "k_proj": "cross_k",
                 "v_proj": "cross_v", "out_proj": "cross_o"}

    for name, w in _iter_safetensors(model_path):
        if name == "proj_out.weight":
            continue  # tied lm head
        name = name.removeprefix("model.")
        side, _, rest = name.partition(".")
        if side == "encoder":
            if rest.startswith("conv"):
                part, _, wk = rest.partition(".")
                enc.setdefault(part, {})[wk] = (
                    jnp.asarray(np.asarray(w)).astype(jnp.float32))
            elif rest == "embed_positions.weight":
                enc["pos"] = to_jax(w)
            elif rest.startswith("layer_norm."):
                enc.setdefault("ln", {})[rest.split(".")[1]] = to_jax(w)
            elif rest.startswith("layers."):
                idx_s, _, tail = rest[len("layers."):].partition(".")
                layer = enc_layers[int(idx_s)]
                part, _, wk = tail.rpartition(".")
                if part.startswith("self_attn."):
                    qkv.setdefault(("e", int(idx_s)), {})[
                        part.split(".")[1] + "." + wk] = np.asarray(w)
                    if part == "self_attn.out_proj":
                        put_dense(layer, "o_proj", wk, w)
                elif part in ("fc1", "fc2"):
                    put_dense(layer, part, wk, w)
                elif part in ln_map:
                    layer.setdefault(ln_map[part], {})[wk] = to_jax(w)
        elif side == "decoder":
            if rest == "embed_tokens.weight":
                params["embed_tokens"] = {"weight": to_jax(w)}
            elif rest == "embed_positions.weight":
                params["dec_pos"] = to_jax(w)
            elif rest.startswith("layer_norm."):
                params.setdefault("norm", {})[
                    rest.split(".")[1]] = to_jax(w)
            elif rest.startswith("layers."):
                idx_s, _, tail = rest[len("layers."):].partition(".")
                layer = dec_layers[int(idx_s)]
                part, _, wk = tail.rpartition(".")
                if part.startswith("self_attn."):
                    qkv.setdefault(("d", int(idx_s)), {})[
                        part.split(".")[1] + "." + wk] = np.asarray(w)
                    if part == "self_attn.out_proj":
                        put_dense(layer, "o_proj", wk, w)
                elif part.startswith("encoder_attn."):
                    put_dense(layer, cross_map[part.split(".")[1]], wk, w)
                elif part in ("fc1", "fc2"):
                    put_dense(layer, part, wk, w)
                elif part in dec_ln_map:
                    layer.setdefault(dec_ln_map[part], {})[wk] = (
                        to_jax(w))
    for (side, i), parts in qkv.items():
        target = enc_layers[i] if side == "e" else dec_layers[i]
        target["qkv_proj"] = {
            "weight": jnp.asarray(np.concatenate(
                [parts["q_proj.weight"].T, parts["k_proj.weight"].T,
                 parts["v_proj.weight"].T], axis=1)).astype(dtype),
            "bias": jnp.asarray(np.concatenate(
                [parts["q_proj.bias"],
                 parts.get("k_proj.bias", np.zeros((E, ), np.float32)),
                 parts["v_proj.bias"]])).astype(dtype),
        }
    # Cross-attn k has no bias in HF either; the dense helper treats a
    # missing bias as zero, so nothing to fill.
    return params


def _load_bert_params(model_path: str, cfg: ModelConfig) -> dict:
    """BERT encoder mapping (HF BertModel names; ref analog: bert.py
    load_weights). q/k/v fuse into qkv_proj; torch Linear [out, in]
    transposes to [in, out]."""
    import numpy as np

    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    qkv_parts: list[dict] = [dict() for _ in range(cfg.num_layers)]

    def to_jax(a):
        return jnp.asarray(np.asarray(a)).astype(dtype)

    emb_map = {
        "embeddings.word_embeddings.weight":
            lambda w: params.setdefault("embed_tokens",
                                        {"weight": to_jax(w)}),
        "embeddings.position_embeddings.weight":
            lambda w: params.__setitem__("pos_embed", to_jax(w)),
        "embeddings.token_type_embeddings.weight":
            lambda w: params.__setitem__("tt_embed", to_jax(w)),
    }
    for name, w in _iter_safetensors(model_path):
        name = name.removeprefix("bert.").removeprefix("roberta.")
        if name in emb_map:
            emb_map[name](w)
        elif name.startswith("embeddings.LayerNorm."):
            params.setdefault("embed_ln", {})[
                name.rsplit(".", 1)[1]] = to_jax(w)
        elif name.startswith("encoder.layer."):
            rest = name[len("encoder.layer."):]
            idx_s, _, tail = rest.partition(".")
            i = int(idx_s)
            layer = layers[i]
            part, _, wk = tail.rpartition(".")  # wk = weight|bias
            if part in ("attention.self.query", "attention.self.key",
                        "attention.self.value"):
                qkv_parts[i][part.rsplit(".", 1)[1] + "." + wk] = (
                    np.asarray(w))
            elif part == "attention.output.dense":
                layer.setdefault("o_proj", {})[wk] = (
                    to_jax(w.T) if wk == "weight" else to_jax(w))
            elif part == "attention.output.LayerNorm":
                layer.setdefault("attn_ln", {})[wk] = to_jax(w)
            elif part == "intermediate.dense":
                layer.setdefault("up_proj", {})[wk] = (
                    to_jax(w.T) if wk == "weight" else to_jax(w))
            elif part == "output.dense":
                layer.setdefault("down_proj", {})[wk] = (
                    to_jax(w.T) if wk == "weight" else to_jax(w))
            elif part == "output.LayerNorm":
                layer.setdefault("out_ln", {})[wk] = to_jax(w)
            else:
                logger.warning("unmapped weight %s", name)
        elif name.startswith("pooler.dense."):
            # CLS-tanh pooler: unused for plain embedding requests
            # (PoolingParams pools raw hidden states) but feeds the
            # classifier head for cross-encoder scoring checkpoints
            # (engine/scoring.py apply_classifier).
            params.setdefault("pooler", {})[
                name.rsplit(".", 1)[1]] = (
                    to_jax(np.asarray(w).T)
                    if name.endswith("weight") else to_jax(w))
        elif name.startswith("classifier."):
            # BertForSequenceClassification head -> /score /rerank
            # /classify (ref: entrypoints/pooling/scoring).
            params.setdefault("classifier", {})[
                name.rsplit(".", 1)[1]] = (
                    to_jax(np.asarray(w).T)
                    if name.endswith("weight") else to_jax(w))
        else:
            logger.warning("unmapped weight %s", name)
    for i, parts in enumerate(qkv_parts):
        layers[i]["qkv_proj"] = {
            "weight": jnp.asarray(np.concatenate(
                [parts["query.weight"].T, parts["key.weight"].T,
                 parts["value.weight"].T], axis=1)).astype(dtype),
            "bias": jnp.asarray(np.concatenate(
                [parts["query.bias"], parts["key.bias"],
                 parts["value.bias"]])).astype(dtype),
        }
    return params


def _load_mamba1_params(model_path: str, cfg: ModelConfig) -> dict:
    """Mamba v1 mapping (HF backbone.* keys; ref analog: mamba.py
    load_weights). conv1d [d_inner, 1, K] -> conv_w [K, d_inner];
    projections transpose to [in, out]."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "backbone.embeddings.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "backbone.norm_f.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("backbone.layers."):
            rest = name[len("backbone.layers."):]
            idx_s, _, tail = rest.partition(".")
            layer = layers[int(idx_s)]
            if tail == "norm.weight":
                layer["norm"] = to_jax(w)
            elif tail in ("mixer.in_proj.weight", "mixer.x_proj.weight",
                          "mixer.out_proj.weight"):
                key = tail.split(".")[1]
                layer[key] = {"weight": to_jax(w.T)}
            elif tail == "mixer.dt_proj.weight":
                layer.setdefault("dt_proj", {})["weight"] = to_jax(w.T)
            elif tail == "mixer.dt_proj.bias":
                layer.setdefault("dt_proj", {})["bias"] = to_jax(w)
            elif tail == "mixer.conv1d.weight":
                layer["conv_w"] = to_jax(w[:, 0, :].T)  # [K, d_inner]
            elif tail == "mixer.conv1d.bias":
                layer["conv_b"] = to_jax(w)
            elif tail in ("mixer.A_log", "mixer.D"):
                layer[tail.split(".")[1]] = jnp.asarray(w).astype(
                    jnp.float32)
            else:
                logger.warning("unmapped weight %s", name)
        else:
            logger.warning("unmapped weight %s", name)
    return params


def _load_mamba2_params(model_path: str, cfg: ModelConfig) -> dict:
    """Mamba2 mapping (HF backbone.* keys; ref analog: mamba2.py
    load_weights). conv1d [conv_dim, 1, K] -> conv_w [K, conv_dim]."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "backbone.embeddings.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "backbone.norm_f.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("backbone.layers."):
            rest = name[len("backbone.layers."):]
            idx_s, _, tail = rest.partition(".")
            layer = layers[int(idx_s)]
            if tail == "norm.weight":
                layer["norm"] = to_jax(w)
            elif tail == "mixer.norm.weight":
                layer["mixer_norm"] = to_jax(w)
            elif tail == "mixer.in_proj.weight":
                layer["in_proj"] = {"weight": to_jax(w.T)}
            elif tail == "mixer.out_proj.weight":
                layer["out_proj"] = {"weight": to_jax(w.T)}
            elif tail == "mixer.conv1d.weight":
                layer["conv_w"] = to_jax(w[:, 0, :].T)  # [K, conv_dim]
            elif tail == "mixer.conv1d.bias":
                layer["conv_b"] = to_jax(w)
            elif tail in ("mixer.A_log", "mixer.D", "mixer.dt_bias"):
                key = tail.split(".")[1]
                layer[key] = jnp.asarray(w).astype(jnp.float32)
            else:
                logger.warning("unmapped weight %s", name)
        else:
            logger.warning("unmapped weight %s", name)
    return params


def _load_bamba_params(model_path: str, cfg: ModelConfig) -> dict:
    """Bamba hybrid mapping: mamba.* mixer leaves on SSM layers,
    fused qkv on attention layers, feed_forward MLP everywhere."""
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.dtype)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}
    fused = {
        "self_attn.q_proj": ("qkv_proj", 0),
        "self_attn.k_proj": ("qkv_proj", 1),
        "self_attn.v_proj": ("qkv_proj", 2),
        "feed_forward.gate_proj": ("gate_up_proj", 0),
        "feed_forward.up_proj": ("gate_up_proj", 1),
    }
    direct = {
        "self_attn.o_proj": "o_proj",
        "feed_forward.down_proj": "down_proj",
        "mamba.in_proj": "in_proj",
        "mamba.out_proj": "out_proj",
    }

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(model_path):
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name == "model.final_layernorm.weight":
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                params["lm_head"] = {"weight": to_jax(w.T)}
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            li = int(idx_s)
            layer = layers[li]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "pre_ff_layernorm.weight":
                layer["pre_ff_layernorm"] = to_jax(w)
            elif tail == "mamba.norm.weight":
                layer["mixer_norm"] = to_jax(w)
            elif tail == "mamba.conv1d.weight":
                layer["conv_w"] = to_jax(w[:, 0, :].T)
            elif tail == "mamba.conv1d.bias":
                layer["conv_b"] = to_jax(w)
            elif tail in ("mamba.A_log", "mamba.D", "mamba.dt_bias"):
                layer[tail.split(".")[1]] = jnp.asarray(w).astype(
                    jnp.float32)
            else:
                mod, _, kind = tail.rpartition(".")
                if mod in direct:
                    leaf = layer.setdefault(direct[mod], {})
                    leaf["weight" if kind == "weight" else "bias"] = \
                        to_jax(w.T if kind == "weight" else w)
                elif mod in fused:
                    leaf_name, slot = fused[mod]
                    pending.setdefault((li, leaf_name, kind),
                                       {})[slot] = w
                else:
                    logger.warning("unmapped weight %s", name)
        else:
            logger.warning("unmapped weight %s", name)

    for (li, leaf_name, kind), slots in pending.items():
        n_slots = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n_slots)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        leaf["weight" if kind == "weight" else "bias"] = to_jax(
            cat.T if kind == "weight" else cat)
    return params


def _validate(params: dict, cfg: ModelConfig) -> None:
    assert "embed_tokens" in params, "missing embed_tokens"
    assert "norm" in params, "missing final norm"
    if not cfg.tie_word_embeddings:
        assert "lm_head" in params, "missing lm_head"
    required = ["input_layernorm", "qkv_proj", "o_proj",
                "gate_up_proj", "down_proj"]
    if cfg.architecture not in ("CohereForCausalLM",
                                "Cohere2ForCausalLM"):
        # Cohere's parallel block has ONE norm per layer.
        required.append("post_attention_layernorm")
    for i, layer in enumerate(params["layers"]):
        for k in required:
            assert k in layer, f"layer {i} missing {k}"
