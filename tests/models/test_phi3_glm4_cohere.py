"""Phi-3 / GLM-4 / Cohere Command-R parity vs HuggingFace.

Ref analogs: vllm phi3 (llama + fused projections + longrope),
glm4.py (sandwich norms + partial interleaved rope), commandr.py
(parallel block + LayerNorm + logit_scale + NoPE full layers in
Cohere2). Each family: prefill logits vs HF + engine greedy decode vs
HF manual-greedy continuation."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.loader.hf_config import model_config_from_hf
from vllm_tpu.loader.safetensors_loader import load_llama_params
from vllm_tpu.models.registry import get_model
from vllm_tpu.ops.kv_cache import kv_cache_shape
from vllm_tpu.ops.metadata import AttentionMetadata

BLOCK_SIZE = 16
NUM_BLOCKS = 64
PROMPT = [2, 45, 99, 200, 7, 13, 42, 77, 150, 3, 9, 88, 123, 250, 17,
          33, 64, 5, 211, 190]


def _save(tmp_path_factory, name, model):
    path = tmp_path_factory.mktemp(name)
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_phi3(tmp_path_factory):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM
    torch.manual_seed(0)
    cfg = Phi3Config(vocab_size=256, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=3,
                     num_attention_heads=4, num_key_value_heads=2,
                     max_position_embeddings=256, rms_norm_eps=1e-5,
                     pad_token_id=0)
    m = Phi3ForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_phi3", m), m


@pytest.fixture(scope="module")
def tiny_phi3_longrope(tmp_path_factory):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM
    torch.manual_seed(1)
    d2 = 8  # head_dim 16 -> 8 freq dims
    cfg = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        original_max_position_embeddings=128, rms_norm_eps=1e-5,
        pad_token_id=0,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.05 * i for i in range(d2)],
            "long_factor": [1.5 + 0.2 * i for i in range(d2)],
        })
    m = Phi3ForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_phi3_lr", m), m


@pytest.fixture(scope="module")
def tiny_glm4(tmp_path_factory):
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM
    torch.manual_seed(2)
    cfg = Glm4Config(vocab_size=256, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=3,
                     num_attention_heads=4, num_key_value_heads=2,
                     head_dim=16, max_position_embeddings=256,
                     rms_norm_eps=1e-5, partial_rotary_factor=0.5,
                     attention_bias=True, pad_token_id=0)
    m = Glm4ForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_glm4", m), m


@pytest.fixture(scope="module")
def tiny_cohere(tmp_path_factory):
    import torch
    from transformers import CohereConfig, CohereForCausalLM
    torch.manual_seed(3)
    cfg = CohereConfig(vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=3,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=256,
                       layer_norm_eps=1e-5, logit_scale=0.25,
                       use_qk_norm=True, tie_word_embeddings=True,
                       pad_token_id=0)
    m = CohereForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_cohere", m), m


@pytest.fixture(scope="module")
def tiny_cohere2(tmp_path_factory):
    import torch
    from transformers import Cohere2Config, Cohere2ForCausalLM
    torch.manual_seed(4)
    cfg = Cohere2Config(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=256,
                        layer_norm_eps=1e-5, logit_scale=0.5,
                        sliding_window=8, sliding_window_pattern=4,
                        tie_word_embeddings=True, pad_token_id=0)
    m = Cohere2ForCausalLM(cfg).eval().to(torch.float32)
    return _save(tmp_path_factory, "tiny_cohere2", m), m


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


def _check_prefill(path, hf_model, atol=3e-4, max_model_len=None):
    import torch
    cfg = model_config_from_hf(path, dtype="float32",
                               max_model_len=max_model_len)
    model = get_model(cfg.architecture)
    params = load_llama_params(path, cfg)
    T = len(PROMPT)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([PROMPT])).logits[0].numpy()
    caches = [
        jnp.zeros(kv_cache_shape(NUM_BLOCKS, BLOCK_SIZE,
                                 cfg.num_kv_heads, cfg.head_dim),
                  jnp.float32) for _ in range(cfg.num_layers)
    ]
    hidden, _ = model.forward(params, cfg,
                              jnp.asarray(PROMPT, jnp.int32),
                              jnp.arange(T, dtype=jnp.int32), caches,
                              _prefill_meta(T, [3, 5]))
    logits = model.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=atol, atol=atol)
    return cfg


def test_phi3_prefill_logits_match_hf(tiny_phi3):
    cfg = _check_prefill(*tiny_phi3)
    assert cfg.architecture == "Phi3ForCausalLM"


def test_phi3_longrope_matches_hf(tiny_phi3_longrope):
    # Serve within the original window: the SHORT factor set applies
    # (HF picks short below original_max_position_embeddings) while
    # the sqrt-log attention factor from the 4x extension applies in
    # both regimes (HF _compute_longrope_parameters).
    cfg = _check_prefill(*tiny_phi3_longrope, max_model_len=128)
    assert (cfg.rope_scaling or {}).get("type") == "longrope"


def test_glm4_prefill_logits_match_hf(tiny_glm4):
    cfg = _check_prefill(*tiny_glm4)
    assert cfg.partial_rotary_factor == 0.5


def test_cohere_prefill_logits_match_hf(tiny_cohere):
    cfg = _check_prefill(*tiny_cohere)
    assert cfg.tie_word_embeddings


def test_cohere2_prefill_logits_match_hf(tiny_cohere2):
    cfg = _check_prefill(*tiny_cohere2)
    assert cfg.layer_types is not None
    assert cfg.layer_types[3] == "full_attention"
    assert cfg.interleaved_sliding_window == 8


@pytest.mark.parametrize("fixture_name", ["tiny_phi3", "tiny_glm4",
                                          "tiny_cohere",
                                          "tiny_cohere2"])
def test_engine_greedy_matches_hf(fixture_name, request):
    """Engine chunked prefill + paged decode vs an HF manual greedy
    loop (hf.generate infers pad masks — manual loop per HF-parity
    pitfalls)."""
    import torch
    path, hf_model = request.getfixturevalue(fixture_name)
    from vllm_tpu.engine.llm import LLM
    from vllm_tpu.sample.params import SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=2, num_kv_blocks=33,
              enable_prefix_caching=False)
    llm.engine.config.model.eos_token_ids = []
    out = llm.generate([PROMPT],
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)
    seq = list(PROMPT)
    with torch.no_grad():
        for _ in range(6):
            logits = hf_model(torch.tensor([seq])).logits[0, -1]
            seq.append(int(logits.argmax()))
    assert got == seq[len(PROMPT):]
