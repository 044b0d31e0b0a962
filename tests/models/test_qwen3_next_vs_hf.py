"""Qwen3-Next (GDN + gated-attention MoE hybrid) parity vs HF.

Validates the Gated DeltaNet mixer (ops/gdn.py), the gated/qk-normed
attention layers, and the hybrid per-layer cache list against HF
Qwen3NextForCausalLM: prefill logits, engine greedy generate, and
state carry across chunked prefill. Ref analog: the reference's
qwen3_next tests + gdn_attn backend.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_qwen3_next(tmp_path_factory):
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM
    torch.manual_seed(0)
    cfg = Qwen3NextConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        linear_conv_kernel_dim=4,
        linear_key_head_dim=16,
        linear_value_head_dim=16,
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=96,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        tie_word_embeddings=False,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
    )
    model = Qwen3NextForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_q3n"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_qwen3_next_prefill_logits_match_hf(tiny_qwen3_next):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import qwen3_next
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_qwen3_next
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "Qwen3NextForCausalLM"
    assert cfg.gdn["num_v_heads"] == 4 and cfg.gdn["head_k_dim"] == 16
    assert cfg.layer_types[0] == "linear_attention"
    params = load_llama_params(path, cfg)
    assert "in_proj_qkvz" in params["layers"][0]
    assert "q_proj" in params["layers"][1]
    assert params["layers"][1]["q_proj"]["weight"].shape == (64, 128)

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3]
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    caches = qwen3_next.make_caches(cfg, 8, 16, 2, None)
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.asarray([[2, 3], [0, 0]], jnp.int32),
        query_start_loc=jnp.asarray([0, T, T], jnp.int32),
        seq_lens=jnp.asarray([T, 0], jnp.int32),
    )
    hidden, caches = qwen3_next.forward(
        params, cfg, jnp.asarray(prompt, jnp.int32),
        jnp.arange(T, dtype=jnp.int32), caches, meta)
    logits = qwen3_next.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-3, atol=2e-3)
    # GDN state written to row 0 only.
    assert np.abs(np.asarray(caches[0].s[0])).sum() > 0
    assert np.abs(np.asarray(caches[0].s[1])).sum() == 0


def test_qwen3_next_engine_generate(tiny_qwen3_next):
    path, hf_model = tiny_qwen3_next
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=64,
              num_kv_blocks=65)
    prompts = [[1, 22, 33, 44], [9, 8, 7, 6, 5, 4, 3, 2]]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    for prompt, out in zip(prompts, outs):
        want = hf_model.generate(torch.tensor([prompt]),
                                 max_new_tokens=8, do_sample=False,
                                 pad_token_id=0)[0][len(prompt):].tolist()
        assert out.outputs[0].token_ids == want


def test_qwen3_next_chunked_prefill_matches(tiny_qwen3_next):
    """GDN conv window + S state carry across prefill chunks."""
    path, hf_model = tiny_qwen3_next
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=2, max_num_batched_tokens=16,
              num_kv_blocks=33)
    prompt = [(i * 13) % 250 + 1 for i in range(40)]  # 3 chunks of 16
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))
    # Manual greedy loop: hf.generate() infers an attention mask that
    # treats any pad_token_id in the PROMPT as padding.
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(4):
            lg = hf_model(torch.tensor([ids])).logits[0, -1]
            ids.append(int(lg.argmax()))
    assert out[0].outputs[0].token_ids == ids[len(prompt):]
