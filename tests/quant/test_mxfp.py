"""MXFP4/MXFP8 (OCP microscaling) quantization tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.mxfp import (MX_BLOCK, _E2M1_FULL, dequant_mxfp,
                                 mxfp_matmul, quantize_mxfp4,
                                 quantize_mxfp8)


def test_mxfp4_roundtrip_exact_on_grid():
    """Values already on the E2M1 grid (times a block power-of-two)
    survive quantization exactly."""
    rng = np.random.default_rng(0)
    K, N = 64, 8
    codes = rng.integers(0, 16, (K, N))
    scales = np.exp2(rng.integers(-3, 4, (K // MX_BLOCK, N)).astype(
        np.float32))
    w = _E2M1_FULL[codes] * np.repeat(scales, MX_BLOCK, axis=0)
    leaf = quantize_mxfp4(w)
    assert leaf["qweight"].shape == (K // 2, N)
    assert leaf["mx_scale"].dtype == jnp.uint8
    back = np.asarray(dequant_mxfp(leaf, jnp.float32))
    np.testing.assert_allclose(back, w, rtol=0, atol=0)


@pytest.mark.parametrize("quant,rel", [(quantize_mxfp4, 0.25),
                                       (quantize_mxfp8, 0.07)])
def test_mxfp_error_bounds(quant, rel):
    rng = np.random.default_rng(1)
    K, N = 256, 64
    w = rng.standard_normal((K, N)).astype(np.float32)
    back = np.asarray(dequant_mxfp(quant(w), jnp.float32))
    # elementwise relative-to-blockmax error bounded by half a ulp of
    # the format at blockmax scale
    blocks = w.reshape(K // MX_BLOCK, MX_BLOCK, N)
    bmax = np.abs(blocks).max(1, keepdims=True)
    err = np.abs(back.reshape(blocks.shape) - blocks) / bmax
    assert err.max() <= rel, err.max()


def test_mxfp_matmul_dispatch():
    rng = np.random.default_rng(2)
    K, N, T = 128, 32, 4
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    leaf = quantize_mxfp4(w)
    got = np.asarray(mxfp_matmul(x, leaf))
    ref = np.asarray(x) @ np.asarray(dequant_mxfp(leaf, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # production dispatch routes mx leaves
    from vllm_tpu.quant.kernels import quantized_matmul
    got2 = np.asarray(quantized_matmul(x, leaf))
    np.testing.assert_allclose(got2, ref, rtol=1e-5, atol=1e-5)


def test_online_mxfp4_engine_generate():
    """Online mxfp4 engine runs and tracks the fp32 engine closely."""
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 QuantizationConfig, SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.quant.online import quantize_params_online
    from vllm_tpu.sample.params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2,
                          max_model_len=128, dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
        quant=QuantizationConfig(method="mxfp4"),
    )
    params = llama.random_params(cfg.model, seed=3)
    qparams = quantize_params_online(
        {k: (v if k != "layers" else
             [dict(l) for l in v]) for k, v in params.items()}, "mxfp4")
    assert "mx_scale" in qparams["layers"][0]["qkv_proj"]
    engine = LLMEngine(cfg, params=qparams, tokenizer=None)
    rid = engine.add_request([1, 9, 17, 33],
                             SamplingParams(temperature=0.0,
                                            max_tokens=8,
                                            ignore_eos=True))
    done = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done = o.outputs[0].token_ids
    assert done is not None and len(done) == 8
