"""Mamba v1 (selective scan) parity vs HF transformers.

Validates the associative-scan prefill (ops/mamba.mamba1_mixer) and
the per-row decode state update against HF MambaForCausalLM: prefill
logits, engine greedy generate, and state carry across chunked
prefill. Ref analog: the reference's mamba tests
(tests/models/language/generation of mamba.py + mamba1_attn backend).
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_mamba1(tmp_path_factory):
    import torch
    from transformers import MambaConfig, MambaForCausalLM
    torch.manual_seed(0)
    cfg = MambaConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        state_size=16,
        conv_kernel=4,
        expand=2,
        time_step_rank=8,
    )
    model = MambaForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_mamba1"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_mamba1_prefill_logits_match_hf(tiny_mamba1):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import mamba1
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_mamba1
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "MambaForCausalLM"
    assert cfg.mamba_dt_rank == 8 and cfg.mamba_d_inner == 128
    params = load_llama_params(path, cfg)
    assert params["layers"][0]["conv_w"].shape == (4, 128)
    assert params["layers"][0]["A_log"].shape == (128, 16)

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3]
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    caches = mamba1.make_caches(cfg, 8, 16, 2, None)
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.zeros((2, 4), jnp.int32),
        query_start_loc=jnp.asarray([0, T, T], jnp.int32),
        seq_lens=jnp.asarray([T, 0], jnp.int32),
    )
    hidden, caches = mamba1.forward(params, cfg,
                                    jnp.asarray(prompt, jnp.int32),
                                    jnp.arange(T, dtype=jnp.int32),
                                    caches, meta)
    logits = mamba1.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)
    # State was written to row 0 only.
    assert np.abs(np.asarray(caches[0].ssm[0])).sum() > 0
    assert np.abs(np.asarray(caches[0].ssm[1])).sum() == 0


def test_mamba1_engine_generate(tiny_mamba1):
    path, hf_model = tiny_mamba1
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


def test_mamba1_chunked_prefill_matches(tiny_mamba1):
    """Prompt split across prefill chunks: conv window + SSM state
    carry across engine steps (the associative-scan carry-injection
    path) and the first sampled tokens match full-prompt HF."""
    path, hf_model = tiny_mamba1
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
