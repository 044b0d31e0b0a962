"""Online quantization: unit + E2E through the engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.online import (_quant_act_int8, _quant_weight_int8,
                                   quantize_params_online, w8a8_matmul)


def test_weight_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    q, s = _quant_weight_int8(w)
    wd = q.astype(np.float32) * s
    assert np.abs(wd - w).max() <= (s.max() / 2) + 1e-6


def test_w8a8_int8_matmul_close():
    rng = np.random.default_rng(1)
    K, N, T = 256, 128, 16
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    x = rng.standard_normal((T, K)).astype(np.float32)
    q, s = _quant_weight_int8(w)
    leaf = {"qweight": jnp.asarray(q), "wscale": jnp.asarray(s)}
    got = np.asarray(w8a8_matmul(jnp.asarray(x), leaf))
    ref = x @ (q.astype(np.float32) * s)
    # activation int8 introduces ~1/127 relative noise per element
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_w8a8_fp8_matmul_close():
    rng = np.random.default_rng(2)
    K, N, T = 256, 128, 8
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    x = rng.standard_normal((T, K)).astype(np.float32)
    from vllm_tpu.quant.online import _quant_weight_fp8
    q, s = _quant_weight_fp8(w)
    leaf = {"qweight": jnp.asarray(q), "wscale": jnp.asarray(s)}
    got = np.asarray(w8a8_matmul(jnp.asarray(x), leaf))
    ref = x @ w
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("method", ["int8", "w8a8_int8", "fp8"])
def test_engine_online_quant_e2e(method):
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=128,
                          intermediate_size=256, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=17),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=2),
    )
    dense = llama.random_params(cfg.model, seed=7)

    def gen(params):
        engine = LLMEngine(cfg, params=params, tokenizer=None)
        engine.add_request([1, 9, 17, 33],
                           SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True))
        toks = None
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    toks = o.outputs[0].token_ids
        return toks

    base = gen(dense)
    import copy
    quantized = quantize_params_online(
        copy.deepcopy(
            {"layers": [dict(l) for l in dense["layers"]],
             **{k: v for k, v in dense.items() if k != "layers"}}),
        method)
    got = gen(quantized)
    assert len(got) == 8
    # 8-bit weights: greedy trajectory shares a prefix with dense.
    shared = sum(1 for a, b in zip(base, got) if a == b)
    assert shared >= 2, (base, got)


def test_online_int4_generate(tmp_path):
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams
    import copy
    from vllm_tpu.quant.online import quantize_params_online

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=256,
                          intermediate_size=512, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=64, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=17),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=2),
    )
    dense = llama.random_params(cfg.model, seed=8)
    q = quantize_params_online(
        {"layers": [dict(l) for l in copy.deepcopy(dense["layers"])],
         **{k: v for k, v in dense.items() if k != "layers"}}, "int4")
    assert "qweight" in q["layers"][0]["qkv_proj"]
    engine = LLMEngine(cfg, params=q, tokenizer=None)
    engine.add_request([1, 9, 17, 33],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    toks = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                toks = o.outputs[0].token_ids
    assert len(toks) == 8
