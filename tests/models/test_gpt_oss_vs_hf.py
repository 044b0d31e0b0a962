"""GPT-OSS parity vs HuggingFace transformers.

Ref analog: the reference's HfRunner/VllmRunner closeness fixtures
against vllm gpt_oss.py. Covers the family quirks: attention sinks in
the softmax denominator, interleaved sliding-window layers, biased
attention/router/experts, clamped-SwiGLU MoE with interleaved gate/up,
YaRN rope, and engine greedy generation end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.loader.hf_config import model_config_from_hf
from vllm_tpu.loader.safetensors_loader import load_llama_params
from vllm_tpu.models import gpt_oss
from vllm_tpu.ops.kv_cache import kv_cache_shape
from vllm_tpu.ops.metadata import AttentionMetadata

BLOCK_SIZE = 16
NUM_BLOCKS = 64
PROMPT = [2, 45, 99, 200, 7, 13, 42, 77, 150, 3, 9, 88, 123, 250, 17,
          33, 64, 5, 211, 190]


@pytest.fixture(scope="module")
def tiny_gpt_oss(tmp_path_factory):
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM
    torch.manual_seed(3)
    cfg = GptOssConfig(vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, max_position_embeddings=256,
                       num_local_experts=4, num_experts_per_tok=2,
                       sliding_window=8)
    m = GptOssForCausalLM(cfg).eval().to(torch.float32)
    m.config._attn_implementation = "eager"
    path = tmp_path_factory.mktemp("tiny_gpt_oss")
    m.save_pretrained(path, safe_serialization=True)
    return str(path), m


def _prefill_meta(num_tokens, block_ids):
    bt = np.zeros((1, 8), np.int32)
    bt[0, :len(block_ids)] = block_ids
    slots = np.array([
        block_ids[i // BLOCK_SIZE] * BLOCK_SIZE + i % BLOCK_SIZE
        for i in range(num_tokens)
    ], np.int32)
    return AttentionMetadata(
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, num_tokens], jnp.int32),
        seq_lens=jnp.asarray([num_tokens], jnp.int32),
    )


def test_prefill_logits_match_hf(tiny_gpt_oss):
    import torch
    path, hf_model = tiny_gpt_oss
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.attention_bias
    assert cfg.interleaved_sliding_window == 8
    assert cfg.layer_types == ("sliding_attention", "full_attention")
    assert cfg.sliding_window is None  # KV manager keeps all blocks
    params = load_llama_params(path, cfg)
    assert "sinks" in params["layers"][0]
    T = len(PROMPT)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([PROMPT])).logits[0].numpy()
    caches = [
        jnp.zeros(kv_cache_shape(NUM_BLOCKS, BLOCK_SIZE,
                                 cfg.num_kv_heads, cfg.head_dim),
                  jnp.float32) for _ in range(cfg.num_layers)
    ]
    hidden, _ = gpt_oss.forward(params, cfg,
                                jnp.asarray(PROMPT, jnp.int32),
                                jnp.arange(T, dtype=jnp.int32), caches,
                                _prefill_meta(T, [3, 5]))
    logits = gpt_oss.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=3e-4, atol=3e-4)


def test_engine_greedy_matches_hf_generate(tiny_gpt_oss):
    """Engine end-to-end (prefill + paged decode with sinks)."""
    import torch
    from vllm_tpu import LLM, SamplingParams
    path, hf_model = tiny_gpt_oss
    llm = LLM(path, dtype="float32", max_model_len=128,
              block_size=BLOCK_SIZE, max_num_seqs=2,
              max_num_batched_tokens=128, num_kv_blocks=NUM_BLOCKS + 1)
    out = llm.generate([PROMPT],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    got = out[0].outputs[0].token_ids
    want = hf_model.generate(
        input_ids=torch.tensor([PROMPT]), max_new_tokens=8,
        do_sample=False, pad_token_id=0)[0][len(PROMPT):].tolist()
    assert got == want
