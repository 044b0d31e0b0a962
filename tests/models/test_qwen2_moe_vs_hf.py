"""Qwen2-MoE (sparse MoE + sigmoid-gated shared expert) parity vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_qwen2_moe(tmp_path_factory):
    import torch
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    torch.manual_seed(0)
    cfg = Qwen2MoeConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=80,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        norm_topk_prob=False,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = Qwen2MoeForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_q2moe"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_qwen2_moe_prefill_logits_match_hf(tiny_qwen2_moe):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import qwen2_moe
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_qwen2_moe
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "Qwen2MoeForCausalLM"
    assert cfg.attention_bias and not cfg.norm_topk_prob
    params = load_llama_params(path, cfg)
    l0 = params["layers"][0]
    assert l0["w_gate_up"].shape == (4, 64, 96)
    assert l0["gate_up_proj"]["weight"].shape == (64, 160)  # shared
    assert l0["shared_gate"]["weight"].shape == (64, 1)
    assert "bias" in l0["qkv_proj"]

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3]
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    caches = [
        jnp.zeros(kv_cache_shape(8, 16, cfg.num_kv_heads, cfg.head_dim),
                  jnp.float32) for _ in range(cfg.num_layers)
    ]
    bt = np.zeros((1, 4), np.int32)
    bt[0, :1] = [2]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
    )
    hidden, _ = qwen2_moe.forward(params, cfg,
                                  jnp.asarray(prompt, jnp.int32),
                                  jnp.arange(T, dtype=jnp.int32),
                                  caches, meta)
    logits = qwen2_moe.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_qwen2_moe_engine_generate(tiny_qwen2_moe):
    path, hf_model = tiny_qwen2_moe
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=256,
              num_kv_blocks=65)
    prompt = [1, 22, 33, 44]
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    want = hf_model.generate(torch.tensor([prompt]), max_new_tokens=8,
                             do_sample=False,
                             pad_token_id=0)[0][len(prompt):].tolist()
    assert out[0].outputs[0].token_ids == want
