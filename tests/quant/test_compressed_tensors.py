"""compressed-tensors + FP8-checkpoint loading: format round-trips and
e2e generate parity vs the dequantized-dense model.

Ref analog: vllm .../quantization/compressed_tensors/ (wNa16 scheme,
pack semantics quant_utils.py:537) and fp8.py checkpoint scales; test
style mirrors tests/quant/test_quant_e2e.py (synthetic checkpoints,
zero-egress)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp
import ml_dtypes

from tests.quant.test_quant_e2e import (HEADS, HIDDEN, INTER, KV_HEADS,
                                        LAYERS, VOCAB, run_generate)
from vllm_tpu.quant.ct_format import (decode_ct_w8, decode_ct_wna16,
                                      unpack_int32)
from vllm_tpu.quant.ref import dequantize_groupwise, quantize_groupwise


def pack_int32(values: np.ndarray, bits: int, axis: int = -1):
    """Test-side encoder mirroring CT pack_quantized_values_into_int32
    (quant_utils.py:537): little-endian bits within each int32 word."""
    pf = 32 // bits
    mask = (1 << bits) - 1
    v = np.moveaxis(values.astype(np.int64), axis, -1)
    assert v.shape[-1] % pf == 0
    out = np.zeros(v.shape[:-1] + (v.shape[-1] // pf, ), np.int64)
    for i in range(pf):
        out |= (v[..., i::pf] & mask) << (bits * i)
    return np.moveaxis(out.astype(np.uint32).view(np.int32)
                       if False else out.astype(np.int32), -1, axis)


@pytest.mark.parametrize("bits", [4, 8])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << bits, (6, 64), dtype=np.int64)
    p = pack_int32(x, bits, axis=1)
    assert p.shape == (6, 64 * bits // 32)
    got = unpack_int32(p, bits, axis=1)
    np.testing.assert_array_equal(got, x)


def test_decode_ct_wna16_matches_quantizer():
    rng = np.random.default_rng(1)
    K, N, g, bits = 256, 128, 128, 4
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    q, s, z = quantize_groupwise(w, bits, g, sym=True)  # q [K,N] uns.
    # encode as CT: [N, K] signed two's complement, packed along input
    signed = q.astype(np.int64) - (1 << (bits - 1))
    wp = pack_int32(signed.T, bits, axis=1)  # [N, K*bits/32]
    ws = s.astype(np.float16).T  # [N, G]
    q2, s2, z2, perm = decode_ct_wna16(wp, ws, None, bits, K)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_allclose(s2, s.astype(np.float16), rtol=1e-3)
    assert (z2 == 8).all() and perm is None


def test_decode_ct_w8_scales():
    rng = np.random.default_rng(2)
    w = rng.integers(-127, 127, (8, 16), dtype=np.int64).astype(np.int8)
    qw, ws = decode_ct_w8(w, np.asarray([0.5]))
    assert qw.shape == (16, 8) and (ws == 0.5).all()
    qw, ws = decode_ct_w8(w, np.arange(8, dtype=np.float32))
    assert ws.shape == (1, 8) and ws[0, 3] == 3.0


def build_ct_checkpoint(path, scheme: str, seed=0):
    """Tiny llama checkpoint in compressed-tensors / fp8 format.
    scheme: 'ct_wna16' | 'ct_fp8' | 'fp8_ckpt'."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)
    g = 128
    tensors: dict[str, np.ndarray] = {}
    dense: dict[str, np.ndarray] = {}

    def add_dense(name, shape, scale=0.05):
        w = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = w
        dense[name] = w

    def add_quant(prefix, K, N):
        w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
        if scheme == "ct_wna16":
            q, s, z = quantize_groupwise(w, 4, g, sym=True)
            signed = q.astype(np.int64) - 8
            tensors[f"{prefix}.weight_packed"] = np.ascontiguousarray(
                pack_int32(signed.T, 4, axis=1))
            # safetensors silently saves raw buffers: views must be
            # made contiguous or the stored data is transposed garbage.
            tensors[f"{prefix}.weight_scale"] = np.ascontiguousarray(
                s.astype(np.float16).T)
            tensors[f"{prefix}.weight_shape"] = np.asarray([N, K],
                                                           np.int64)
            dense[f"{prefix}.weight"] = dequantize_groupwise(
                q, s.astype(np.float16).astype(np.float32), z,
                g).T.astype(np.float32)
        else:  # fp8 weight + per-channel scale, [N, K] layout
            absmax = np.abs(w).max(axis=0) + 1e-8  # per N column
            scale = (absmax / 448.0).astype(np.float32)  # [N]
            q8 = (w / scale[None, :]).astype(ml_dtypes.float8_e4m3fn)
            tensors[f"{prefix}.weight"] = np.ascontiguousarray(q8.T)
            tensors[f"{prefix}.weight_scale"] = scale.reshape(-1, 1)
            dense[f"{prefix}.weight"] = (
                q8.astype(np.float32) * scale[None, :]).T

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

    if scheme == "ct_wna16":
        qcfg = {
            "quant_method": "compressed-tensors",
            "format": "pack-quantized",
            "config_groups": {
                "group_0": {
                    "weights": {
                        "num_bits": 4, "type": "int", "symmetric": True,
                        "strategy": "group", "group_size": g,
                    },
                    "input_activations": None,
                }
            },
        }
    elif scheme == "ct_fp8":
        qcfg = {
            "quant_method": "compressed-tensors",
            "format": "float-quantized",
            "config_groups": {
                "group_0": {
                    "weights": {
                        "num_bits": 8, "type": "float",
                        "symmetric": True, "strategy": "channel",
                    },
                    "input_activations": {"dynamic": True,
                                          "num_bits": 8,
                                          "type": "float"},
                }
            },
        }
    else:  # fp8_ckpt
        qcfg = {"quant_method": "fp8", "activation_scheme": "dynamic"}
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
        "quantization_config": qcfg,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    return dense


@pytest.mark.parametrize("scheme", ["ct_wna16", "ct_fp8", "fp8_ckpt"])
def test_detect(tmp_path, scheme):
    from vllm_tpu.quant.config import detect_quant_config
    build_ct_checkpoint(str(tmp_path), scheme)
    qc = detect_quant_config(str(tmp_path))
    assert qc.method == scheme
    if scheme == "ct_wna16":
        assert qc.bits == 4 and qc.group_size == 128 and qc.sym


def test_ct_wna16_generate_matches_dequant_dense(tmp_path):
    path = str(tmp_path)
    dense = build_ct_checkpoint(path, "ct_wna16")
    got = run_generate(path, quantization=None)
    ref = run_generate(path, quantization=None, dense_tensors=dense)
    assert got == ref


@pytest.mark.parametrize("scheme", ["ct_fp8", "fp8_ckpt"])
def test_fp8_weights_load_exactly_and_forward_close(tmp_path, scheme):
    """The fp8 reader must reproduce the serialized weights EXACTLY
    (qweight * wscale == dequant twin); the forward pass then runs with
    dynamic activation quantization, so logits are compared by cosine
    (greedy tokens on random weights flip under ~1% act-quant noise)."""
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import llama
    from vllm_tpu.ops.metadata import AttentionMetadata
    from vllm_tpu.quant.config import detect_quant_config

    path = str(tmp_path)
    dense = build_ct_checkpoint(path, scheme)
    qc = detect_quant_config(path)
    assert qc.method == scheme
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg, qc)

    # exact weight reconstruction
    leaf = params["layers"][0]["o_proj"]
    w = (np.asarray(leaf["qweight"], np.float32) *
         np.asarray(leaf["wscale"]))
    ref_w = dense["model.layers.0.self_attn.o_proj.weight"].T
    np.testing.assert_array_equal(w, ref_w)

    # forward close (cosine) vs dense twin
    dense_params = _dense_params_from(dense)
    kv = [jnp.zeros((5, 2 * KV_HEADS, 16, 128), jnp.float32)
          for _ in range(LAYERS)]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([16, 17, 18, 19]),
        block_tables=jnp.asarray([[1, 2, 3, 4]]),
        query_start_loc=jnp.asarray([0, 4]),
        seq_lens=jnp.asarray([4]),
    )
    ids = jnp.asarray([1, 5, 9, 200])
    pos = jnp.asarray([0, 1, 2, 3])
    h_q, _ = llama.forward(params, cfg, ids, pos,
                           [jnp.copy(c) for c in kv], meta, q_blk=16)
    h_d, _ = llama.forward(dense_params, cfg, ids, pos,
                           [jnp.copy(c) for c in kv], meta, q_blk=16)
    lq = np.asarray(llama.compute_logits(params, cfg, h_q)).ravel()
    ld = np.asarray(llama.compute_logits(dense_params, cfg, h_d)).ravel()
    cos = (lq @ ld) / (np.linalg.norm(lq) * np.linalg.norm(ld))
    assert cos > 0.99, cos


def _dense_params_from(t: dict) -> dict:
    layers = []
    for i in range(LAYERS):
        p = f"model.layers.{i}"
        layers.append({
            "input_layernorm":
            jnp.asarray(t[f"{p}.input_layernorm.weight"]),
            "post_attention_layernorm":
            jnp.asarray(t[f"{p}.post_attention_layernorm.weight"]),
            "qkv_proj": {
                "weight": jnp.asarray(np.concatenate([
                    t[f"{p}.self_attn.q_proj.weight"],
                    t[f"{p}.self_attn.k_proj.weight"],
                    t[f"{p}.self_attn.v_proj.weight"],
                ], 0).T)
            },
            "o_proj":
            {"weight": jnp.asarray(t[f"{p}.self_attn.o_proj.weight"].T)},
            "gate_up_proj": {
                "weight": jnp.asarray(np.concatenate([
                    t[f"{p}.mlp.gate_proj.weight"],
                    t[f"{p}.mlp.up_proj.weight"],
                ], 0).T)
            },
            "down_proj":
            {"weight": jnp.asarray(t[f"{p}.mlp.down_proj.weight"].T)},
        })
    return {
        "embed_tokens":
        {"weight": jnp.asarray(t["model.embed_tokens.weight"])},
        "norm": jnp.asarray(t["model.norm.weight"]),
        "lm_head": {"weight": jnp.asarray(t["lm_head.weight"].T)},
        "layers": layers,
    }
