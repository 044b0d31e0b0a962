"""Qwen3 (qk-norm) parity vs HF + n>1 parallel sampling."""

import numpy as np
import pytest


def test_qwen3_generate_matches_hf(tmp_path):
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM
    torch.manual_seed(0)
    cfg = Qwen3Config(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, max_position_embeddings=128,
                      tie_word_embeddings=False)
    hf = Qwen3ForCausalLM(cfg).eval()
    path = str(tmp_path)
    hf.save_pretrained(path, safe_serialization=True)

    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, max_num_batched_tokens=128, num_kv_blocks=9)
    prompt = [1, 22, 33, 44]
    got = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    want = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                       do_sample=False,
                       pad_token_id=0)[0][len(prompt):].tolist()
    assert got.outputs[0].token_ids == want


def test_n_greater_than_one(tmp_path):
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu import SamplingParams
    from vllm_tpu.engine.llm import LLM
    from vllm_tpu.models import llama

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=8),
    )
    params = llama.random_params(cfg.model, seed=61)
    llm = LLM("", engine_config=cfg, params=params)
    sp = SamplingParams(n=3, temperature=0.9, seed=5, max_tokens=6,
                       ignore_eos=True)
    out = llm.generate([[1, 9, 17]], sp)[0]
    assert len(out.outputs) == 3
    assert [c.index for c in out.outputs] == [0, 1, 2]
    for c in out.outputs:
        assert len(c.token_ids) == 6
    # different seeds -> (overwhelmingly) not all identical
    assert len({tuple(c.token_ids) for c in out.outputs}) > 1
