"""E2E quantized inference: synthetic GPTQ/AWQ checkpoints through the
full engine vs the dequantized-dense model.

Ref analog: tests/quantization/test_auto_round.py (real AutoRound
checkpoints + scheme resolution) — here checkpoints are synthesized
offline (zero-egress) with our encoder, which the format unit tests pin
against the GPTQ/AWQ bit layouts.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.formats import encode_awq, encode_gptq
from vllm_tpu.quant.ref import dequantize_groupwise, quantize_groupwise

HIDDEN, INTER, HEADS, KV_HEADS, LAYERS, VOCAB = 256, 512, 4, 2, 2, 512


def build_quant_checkpoint(path, fmt: str, bits=4, sym=True, seed=0):
    """Create a tiny llama GPTQ/AWQ checkpoint + the dense-equivalent
    weights (HF layout, [out, in]) for reference."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    g = 128
    tensors: dict[str, np.ndarray] = {}
    dense: dict[str, np.ndarray] = {}

    def add_dense(name, shape, scale=0.05):
        w = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = w
        dense[name] = w
        return w

    def add_quant(prefix, K, N):
        w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
        q, s, z = quantize_groupwise(w, bits, g, sym)
        enc = encode_gptq(q, s, z, bits) if fmt == "gptq" else \
            encode_awq(q, s, z, bits)
        for k, v in enc.items():
            tensors[f"{prefix}.{k}"] = v
        # Dense reference must see the same f16-roundtripped scales the
        # loader reads from the checkpoint. HF dense layout is [out, in].
        s_rt = enc["scales"].astype(np.float32)
        dense[f"{prefix}.weight"] = dequantize_groupwise(
            q, s_rt, z, g).T.astype(np.float32)

    D = HIDDEN // HEADS
    for i in range(LAYERS):
        p = f"model.layers.{i}"
        add_dense(f"{p}.input_layernorm.weight", (HIDDEN, ), 1.0)
        add_dense(f"{p}.post_attention_layernorm.weight", (HIDDEN, ), 1.0)
        add_quant(f"{p}.self_attn.q_proj", HIDDEN, HEADS * D)
        add_quant(f"{p}.self_attn.k_proj", HIDDEN, KV_HEADS * D)
        add_quant(f"{p}.self_attn.v_proj", HIDDEN, KV_HEADS * D)
        add_quant(f"{p}.self_attn.o_proj", HEADS * D, HIDDEN)
        add_quant(f"{p}.mlp.gate_proj", HIDDEN, INTER)
        add_quant(f"{p}.mlp.up_proj", HIDDEN, INTER)
        add_quant(f"{p}.mlp.down_proj", INTER, HIDDEN)
    add_dense("model.embed_tokens.weight", (VOCAB, HIDDEN))
    add_dense("model.norm.weight", (HIDDEN, ), 1.0)
    add_dense("lm_head.weight", (VOCAB, HIDDEN))

    save_file(tensors, os.path.join(path, "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": VOCAB,
        "hidden_size": HIDDEN,
        "intermediate_size": INTER,
        "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS,
        "num_key_value_heads": KV_HEADS,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "float16",
        "quantization_config": {
            "quant_method": "gptq" if fmt == "gptq" else "awq",
            "bits": bits,
            "group_size": g,
            "sym": sym,
            "desc_act": False,
            **({"zero_point": True} if fmt == "awq" else {}),
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    return dense


def run_generate(path, quantization, dense_tensors=None):
    from vllm_tpu import LLM, SamplingParams
    params = None
    if dense_tensors is not None:
        # Build the dense param pytree directly from the dequantized
        # tensors (bypasses the quant loader).
        from vllm_tpu.loader.hf_config import model_config_from_hf
        cfg = model_config_from_hf(path, dtype="float32")
        layers = []
        for i in range(LAYERS):
            p = f"model.layers.{i}"
            t = dense_tensors
            layers.append({
                "input_layernorm":
                jnp.asarray(t[f"{p}.input_layernorm.weight"]),
                "post_attention_layernorm":
                jnp.asarray(t[f"{p}.post_attention_layernorm.weight"]),
                "qkv_proj": {
                    "weight":
                    jnp.asarray(
                        np.concatenate([
                            t[f"{p}.self_attn.q_proj.weight"],
                            t[f"{p}.self_attn.k_proj.weight"],
                            t[f"{p}.self_attn.v_proj.weight"],
                        ], 0).T)
                },
                "o_proj":
                {"weight": jnp.asarray(t[f"{p}.self_attn.o_proj.weight"].T)},
                "gate_up_proj": {
                    "weight":
                    jnp.asarray(
                        np.concatenate([
                            t[f"{p}.mlp.gate_proj.weight"],
                            t[f"{p}.mlp.up_proj.weight"],
                        ], 0).T)
                },
                "down_proj":
                {"weight": jnp.asarray(t[f"{p}.mlp.down_proj.weight"].T)},
            })
        params = {
            "embed_tokens":
            {"weight": jnp.asarray(dense_tensors["model.embed_tokens.weight"])},
            "norm": jnp.asarray(dense_tensors["model.norm.weight"]),
            "lm_head":
            {"weight": jnp.asarray(dense_tensors["lm_head.weight"].T)},
            "layers": layers,
        }
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=65, quantization=quantization, params=params)
    prompts = [[1, 5, 9, 200], [7, 300, 77]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, sp)
    return [o.outputs[0].token_ids for o in outs]


@pytest.mark.parametrize("fmt", ["gptq", "awq"])
def test_quantized_generate_matches_dequant_dense(tmp_path, fmt):
    path = str(tmp_path)
    dense = build_quant_checkpoint(path, fmt, sym=(fmt == "gptq"))
    got = run_generate(path, quantization=None)  # auto-detected
    ref = run_generate(path, quantization=None, dense_tensors=dense)
    assert got == ref


def test_detect_quant_config(tmp_path):
    from vllm_tpu.quant.config import detect_quant_config
    path = str(tmp_path)
    build_quant_checkpoint(path, "gptq")
    qc = detect_quant_config(path)
    assert qc.method == "gptq" and qc.bits == 4 and qc.group_size == 128
    assert qc.sym and not qc.desc_act
