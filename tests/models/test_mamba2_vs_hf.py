"""Mamba2 (pure SSM) parity vs HF transformers.

Validates the per-row state-cache design: prefill scan == HF chunked
SSD, engine decode (vectorized single-token state update) == HF greedy
generate, including across chunked prefill.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_mamba2(tmp_path_factory):
    import torch
    from transformers import Mamba2Config, Mamba2ForCausalLM
    torch.manual_seed(0)
    cfg = Mamba2Config(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        state_size=16,
        conv_kernel=4,
        n_groups=2,
        num_heads=8,
        head_dim=16,
        expand=2,
        tie_word_embeddings=False,
    )
    model = Mamba2ForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_mamba2"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_mamba2_prefill_logits_match_hf(tiny_mamba2):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import mamba2
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_mamba2
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "Mamba2ForCausalLM"
    assert cfg.mamba_num_heads == 8 and cfg.mamba_d_inner == 128
    params = load_llama_params(path, cfg)
    assert params["layers"][0]["conv_w"].shape[0] == 4

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3]
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    caches = mamba2.make_caches(cfg, 8, 16, 2, None)
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.zeros((2, 4), jnp.int32),
        query_start_loc=jnp.asarray([0, T, T], jnp.int32),
        seq_lens=jnp.asarray([T, 0], jnp.int32),
    )
    hidden, caches = mamba2.forward(params, cfg,
                                    jnp.asarray(prompt, jnp.int32),
                                    jnp.arange(T, dtype=jnp.int32),
                                    caches, meta)
    logits = mamba2.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)
    # State was written to row 0 only.
    assert np.abs(np.asarray(caches[0].ssm[0])).sum() > 0
    assert np.abs(np.asarray(caches[0].ssm[1])).sum() == 0


def test_mamba2_engine_generate(tiny_mamba2):
    path, hf_model = tiny_mamba2
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


def test_mamba2_chunked_prefill_matches(tiny_mamba2):
    """Prompt split across prefill chunks: state carries across steps
    and the first sampled token matches full-prompt HF."""
    path, hf_model = tiny_mamba2
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=2, max_num_batched_tokens=16,
              num_kv_blocks=33)
    prompt = [(i * 13) % 250 for i in range(40)]  # 3 chunks of 16
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))
    want = hf_model.generate(torch.tensor([prompt]), max_new_tokens=4,
                             do_sample=False,
                             pad_token_id=0)[0][len(prompt):].tolist()
    assert out[0].outputs[0].token_ids == want
