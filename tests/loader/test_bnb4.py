"""Pre-quantized bitsandbytes NF4 checkpoint loading (ref analog:
model_loader/bitsandbytes_loader.py). The test WRITES a bnb-format
checkpoint (packed NF4 codes (first<<4)|second over the flattened
row-major weight, per-64 absmax, quant_map, serialized quant_state;
one variant with double-quantized absmax) and asserts logits parity
against the dense model built from the dequantized weights."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.online import NF4_LEVELS


def _bnb_quant(w: np.ndarray, double_quant: bool):
    """torch-free reimplementation of bnb quantize_4bit (nf4)."""
    out, in_ = w.shape
    flat = w.reshape(-1, 64)
    absmax = np.abs(flat).max(axis=1)
    absmax = np.where(absmax > 0, absmax, 1.0).astype(np.float32)
    normed = flat / absmax[:, None]
    mids = (NF4_LEVELS[1:] + NF4_LEVELS[:-1]) / 2
    codes = np.searchsorted(mids, normed.reshape(-1)).astype(np.uint8)
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    tensors = {"quant_map": NF4_LEVELS.astype(np.float32)}
    state = {"blocksize": 64, "quant_type": "nf4", "shape": [out, in_]}
    if double_quant:
        off = float(absmax.mean())
        centered = absmax - off
        nbs = 256
        pad = (-centered.size) % nbs
        cpad = np.pad(centered, (0, pad))
        nam = np.abs(cpad.reshape(-1, nbs)).max(axis=1)
        nam = np.where(nam > 0, nam, 1.0).astype(np.float32)
        # 8-bit linear codebook quantization of the absmax plane
        qmap8 = np.linspace(-1.0, 1.0, 256).astype(np.float32)
        normed8 = (cpad.reshape(-1, nbs) / nam[:, None]).reshape(-1)
        mids8 = (qmap8[1:] + qmap8[:-1]) / 2
        a_codes = np.searchsorted(mids8, normed8).astype(np.uint8)
        tensors["absmax"] = a_codes[:absmax.size]
        tensors["nested_absmax"] = nam
        tensors["nested_quant_map"] = qmap8
        state["nested_blocksize"] = nbs
        state["nested_offset"] = off
        # dequantized view for the parity reference
        deq = (qmap8[a_codes] * np.repeat(nam, nbs)[:a_codes.size] +
               off)[:absmax.size]
        absmax_eff = deq
    else:
        tensors["absmax"] = absmax
        absmax_eff = absmax
    tensors["weight"] = packed.reshape(-1, 1)
    tensors["quant_state.bitsandbytes__nf4"] = np.frombuffer(
        json.dumps(state).encode(), np.uint8).copy()
    w_deq = (NF4_LEVELS[codes].reshape(-1, 64) *
             absmax_eff[:, None]).reshape(out, in_).astype(np.float32)
    return tensors, w_deq


def _write_ckpt(path, rng, double_quant):
    from safetensors.numpy import save_file
    E, I, H, KH, L, V = 64, 128, 4, 2, 2, 128
    os.makedirs(path, exist_ok=True)
    cfgd = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": E, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": H,
        "num_key_value_heads": KH, "vocab_size": V,
        "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
        "torch_dtype": "float32",
        "quantization_config": {
            "quant_method": "bitsandbytes", "load_in_4bit": True,
            "bnb_4bit_quant_type": "nf4",
            "bnb_4bit_use_double_quant": double_quant,
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfgd, f)
    tensors = {}
    dense = {"layers": []}
    emb = (rng.standard_normal((V, E)) * 0.05).astype(np.float32)
    tensors["model.embed_tokens.weight"] = emb
    dense["embed_tokens"] = emb
    tensors["model.norm.weight"] = np.ones(E, np.float32)
    head = (rng.standard_normal((V, E)) * 0.05).astype(np.float32)
    tensors["lm_head.weight"] = head
    dense["lm_head"] = head.T
    D = E // H
    mods = {"self_attn.q_proj": (H * D, E), "self_attn.k_proj": (KH * D, E),
            "self_attn.v_proj": (KH * D, E), "self_attn.o_proj": (E, H * D),
            "mlp.gate_proj": (I, E), "mlp.up_proj": (I, E),
            "mlp.down_proj": (E, I)}
    for li in range(L):
        lay = {}
        tensors[f"model.layers.{li}.input_layernorm.weight"] = np.ones(
            E, np.float32)
        tensors[f"model.layers.{li}.post_attention_layernorm.weight"] = \
            np.ones(E, np.float32)
        for mod, (o, i) in mods.items():
            w = (rng.standard_normal((o, i)) * 0.05).astype(np.float32)
            t, w_deq = _bnb_quant(w, double_quant)
            for k, v in t.items():
                tensors[f"model.layers.{li}.{mod}.weight" +
                        ("." + k if k != "weight" else "")] = v
            lay[mod.split(".")[-1]] = w_deq.T  # [in, out]
        dense["layers"].append(lay)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    return dense


@pytest.mark.parametrize("double_quant", [False, True])
def test_bnb4_checkpoint_matches_dequant(tmp_path, double_quant):
    from vllm_tpu.engine.llm import LLM
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams
    rng = np.random.default_rng(0 if not double_quant else 1)
    path = str(tmp_path / "bnb")
    dense = _write_ckpt(path, rng, double_quant)
    llm = LLM(path, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, num_kv_blocks=17,
              enable_prefix_caching=False)
    leaf = llm.engine.runner.params["layers"][0]["qkv_proj"]
    assert "codebook" in leaf  # NF4 codebook path
    # dense reference model from the exactly-dequantized weights
    cfg = llm.engine.config.model
    ref_params = llama.random_params(cfg, seed=0)
    ref_params["embed_tokens"] = {
        "weight": jnp.asarray(dense["embed_tokens"])}
    ref_params["norm"] = jnp.ones((64, ), jnp.float32)
    ref_params["lm_head"] = {"weight": jnp.asarray(dense["lm_head"])}
    for li, lay in enumerate(dense["layers"]):
        L = ref_params["layers"][li]
        L["input_layernorm"] = jnp.ones((64, ), jnp.float32)
        L["post_attention_layernorm"] = jnp.ones((64, ), jnp.float32)
        L["qkv_proj"] = {"weight": jnp.asarray(
            np.concatenate([lay["q_proj"], lay["k_proj"],
                            lay["v_proj"]], axis=1))}
        L["o_proj"] = {"weight": jnp.asarray(lay["o_proj"])}
        L["gate_up_proj"] = {"weight": jnp.asarray(
            np.concatenate([lay["gate_proj"], lay["up_proj"]], axis=1))}
        L["down_proj"] = {"weight": jnp.asarray(lay["down_proj"])}
    ref = LLM("", dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, num_kv_blocks=17,
              enable_prefix_caching=False,
              engine_config=llm.engine.config, params=ref_params)
    prompt = [5, 9, 17, 33, 60]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    got = llm.generate([prompt], sp)[0].outputs[0].token_ids
    want = ref.generate([prompt], sp)[0].outputs[0].token_ids
    assert got == want
