"""Perplexity harness: parity with HF cross-entropy + quant ppl gates."""

import math

import numpy as np
import pytest

from vllm_tpu.evals.ppl import compute_ppl_from_params


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(3)
    hf = LlamaForCausalLM(
        LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2,
                    max_position_embeddings=256)).eval()
    path = str(tmp_path_factory.mktemp("ppl_model"))
    hf.save_pretrained(path, safe_serialization=True)
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)
    return hf, cfg, params


def test_ppl_matches_hf_cross_entropy(tiny):
    import torch
    hf, cfg, params = tiny
    rng = np.random.default_rng(0)
    toks = [int(t) for t in rng.integers(1, 250, size=60)]
    with torch.no_grad():
        out = hf(torch.tensor([toks]), labels=torch.tensor([toks]))
    hf_ppl = math.exp(float(out.loss))
    ours = compute_ppl_from_params(params, cfg, toks, block_size=16)
    assert math.isclose(ours, hf_ppl, rel_tol=2e-3), (ours, hf_ppl)


def test_ppl_chunked_equals_single(tiny):
    _, cfg, params = tiny
    rng = np.random.default_rng(1)
    toks = [int(t) for t in rng.integers(1, 250, size=90)]
    whole = compute_ppl_from_params(params, cfg, toks, chunk=1024)
    chunked = compute_ppl_from_params(params, cfg, toks, chunk=32)
    assert math.isclose(whole, chunked, rel_tol=1e-4)


def test_online_int8_ppl_delta_small(tiny):
    import copy
    from vllm_tpu.quant.online import quantize_params_online
    _, cfg, params = tiny
    rng = np.random.default_rng(2)
    toks = [int(t) for t in rng.integers(1, 250, size=80)]
    base = compute_ppl_from_params(params, cfg, toks)
    qparams = quantize_params_online(
        {"layers": [dict(l) for l in copy.deepcopy(params["layers"])],
         **{k: v for k, v in params.items() if k != "layers"}}, "int8")
    quant = compute_ppl_from_params(qparams, cfg, toks)
    # int8 per-channel on an fp32 model: tiny ppl movement.
    assert abs(quant - base) / base < 0.05, (base, quant)
