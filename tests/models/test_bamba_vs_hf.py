"""Bamba hybrid (Mamba2 + attention) parity vs HF transformers —
exercises mixed per-layer cache types (paged KV + per-row SSM state)
and partial rotary embeddings."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_bamba(tmp_path_factory):
    import torch
    from transformers import BambaConfig, BambaForCausalLM
    torch.manual_seed(0)
    cfg = BambaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        mamba_n_heads=8,
        mamba_d_head=16,
        mamba_expand=2,
        mamba_d_state=16,
        mamba_d_conv=4,
        mamba_n_groups=2,
        attn_layer_indices=[1],  # mamba, attention, mamba
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = BambaForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_bamba"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_bamba_prefill_logits_match_hf(tiny_bamba):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import bamba
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_bamba
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.layer_types == ("mamba", "attention", "mamba")
    assert cfg.partial_rotary_factor == 0.5
    params = load_llama_params(path, cfg)
    assert "qkv_proj" in params["layers"][1]
    assert "in_proj" in params["layers"][0]

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3]
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    caches = bamba.make_caches(cfg, 8, 16, 2, None)
    bt = np.zeros((2, 4), np.int32)
    bt[0, :2] = [2, 3]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, T, T], jnp.int32),
        seq_lens=jnp.asarray([T, 0], jnp.int32),
    )
    hidden, _ = bamba.forward(params, cfg,
                              jnp.asarray(prompt, jnp.int32),
                              jnp.arange(T, dtype=jnp.int32), caches,
                              meta)
    logits = bamba.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_bamba_engine_generate(tiny_bamba):
    path, hf_model = tiny_bamba
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=64,
              num_kv_blocks=65)
    prompts = [[1, 22, 33, 44], [9, 8, 7, 6, 5]]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    for prompt, out in zip(prompts, outs):
        want = hf_model.generate(torch.tensor([prompt]),
                                 max_new_tokens=8, do_sample=False,
                                 pad_token_id=0)[0][len(prompt):].tolist()
        assert out.outputs[0].token_ids == want
