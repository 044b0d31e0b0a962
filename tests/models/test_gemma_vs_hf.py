"""Gemma-1/2/3 parity vs HuggingFace transformers.

Ref analog: the reference's HfRunner/VllmRunner closeness fixtures
(tests/conftest.py:367,938) against vllm gemma.py/gemma2.py/gemma3.py.
Covers the family quirks: (1+w) RMSNorm, sqrt(E)-scaled embeddings,
GeGLU, sandwich norms + softcaps + interleaved sliding windows
(Gemma-2), qk-norm + dual rope (Gemma-3), tied logits, and engine
greedy generation end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.loader.hf_config import model_config_from_hf
from vllm_tpu.loader.safetensors_loader import load_llama_params
from vllm_tpu.models import gemma
from vllm_tpu.ops.kv_cache import kv_cache_shape
from vllm_tpu.ops.metadata import AttentionMetadata

BLOCK_SIZE = 16
NUM_BLOCKS = 64

PROMPT = [2, 45, 99, 200, 7, 13, 42, 77, 150, 3, 9, 88, 123, 250, 17,
          33, 64, 5, 211, 190]  # 20 tokens, crosses a block boundary


def _save(tmp_path_factory, name, model):
    path = tmp_path_factory.mktemp(name)
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_gemma1(tmp_path_factory):
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM
    torch.manual_seed(0)
    cfg = GemmaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=3,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, max_position_embeddings=256,
                      rms_norm_eps=1e-6)
    m = GemmaForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_gemma1", m), m


@pytest.fixture(scope="module")
def tiny_gemma2(tmp_path_factory):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM
    torch.manual_seed(1)
    cfg = Gemma2Config(vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=4,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, max_position_embeddings=256,
                       query_pre_attn_scalar=16,
                       attn_logit_softcapping=50.0,
                       final_logit_softcapping=30.0,
                       sliding_window=8)  # small: exercises masking
    m = Gemma2ForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_gemma2", m), m


@pytest.fixture(scope="module")
def tiny_gemma3(tmp_path_factory):
    import torch
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig
    torch.manual_seed(2)
    cfg = Gemma3TextConfig(vocab_size=256, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=6,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=16, max_position_embeddings=256,
                           query_pre_attn_scalar=16, sliding_window=8,
                           rope_theta=1000000.0,
                           rope_local_base_freq=10000.0)
    m = Gemma3ForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_gemma3", m), m


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


def _check_prefill(path, hf_model, atol=2e-4):
    import torch
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)
    T = len(PROMPT)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([PROMPT])).logits[0].numpy()
    caches = [
        jnp.zeros(kv_cache_shape(NUM_BLOCKS, BLOCK_SIZE,
                                 cfg.num_kv_heads, cfg.head_dim),
                  jnp.float32) for _ in range(cfg.num_layers)
    ]
    hidden, caches = gemma.forward(params, cfg,
                                   jnp.asarray(PROMPT, jnp.int32),
                                   jnp.arange(T, dtype=jnp.int32),
                                   caches, _prefill_meta(T, [3, 5]))
    logits = gemma.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=atol, atol=atol)
    return cfg


def test_gemma1_prefill_logits_match_hf(tiny_gemma1):
    cfg = _check_prefill(*tiny_gemma1)
    assert cfg.scale_embeddings and cfg.tie_word_embeddings
    assert cfg.query_pre_attn_scalar is None


def test_gemma2_prefill_logits_match_hf(tiny_gemma2):
    cfg = _check_prefill(*tiny_gemma2)
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.logit_softcap == 30.0
    assert cfg.interleaved_sliding_window == 8
    assert cfg.layer_types[0] == "sliding_attention"
    assert cfg.sliding_window is None  # KV manager must keep blocks


def test_gemma3_prefill_logits_match_hf(tiny_gemma3):
    cfg = _check_prefill(*tiny_gemma3)
    assert cfg.rope_local_base_freq == 10000.0
    assert cfg.layer_types[-1] == "full_attention"


@pytest.mark.parametrize("fixture_name",
                         ["tiny_gemma1", "tiny_gemma2", "tiny_gemma3"])
def test_engine_greedy_matches_hf_generate(fixture_name, request):
    """Engine end-to-end (prefill + paged decode) greedy == HF."""
    import torch
    from vllm_tpu import LLM, SamplingParams
    path, hf_model = request.getfixturevalue(fixture_name)
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
