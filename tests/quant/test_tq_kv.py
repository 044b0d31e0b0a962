"""TurboQuant codebook KV cache (tq4 / tq3 cache dtypes).

Ref analog: vllm/v1/attention/backends/turboquant_attn.py +
quantization/turboquant/ — codebook (non-uniform) per-token-head KV
quantization over the RHT-rotated basis. Checks: Lloyd-Max codebook
beats the uniform int4 grid on Gaussian data, cache write/dequant
round-trip, attention parity, and the engine e2e path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.ops.attention import ragged_paged_attention_xla
from vllm_tpu.ops.kv_cache import (dequant_block_kv, kv_cache_shape,
                                   make_kv_cache, quantize_rows_int4,
                                   quantize_rows_tq, tq_codebook,
                                   write_kv_xla, _rht_matrix, _unpack_tq)


def _roundtrip_tq(x, dtype):
    cb = tq_codebook(dtype)
    packed, scale = quantize_rows_tq(jnp.asarray(x), cb)
    vals = _unpack_tq(packed, cb) * scale[..., None]
    return np.asarray(vals @ _rht_matrix(x.shape[-1]).T)


def test_tq4_beats_uniform_int4_on_gaussian():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 4, 128)).astype(np.float32)
    got_tq = _roundtrip_tq(x, "tq4")
    packed, scale = quantize_rows_int4(jnp.asarray(x))
    from vllm_tpu.ops.kv_cache import _unpack_int4
    vals = np.asarray(_unpack_int4(packed)) * np.asarray(scale)[..., None]
    got_int4 = vals @ np.asarray(_rht_matrix(128)).T
    mse_tq = np.mean((got_tq - x) ** 2)
    mse_int4 = np.mean((got_int4 - x) ** 2)
    # Lloyd-Max N(0,1) levels vs amax-scaled uniform grid: strictly
    # better on Gaussian inputs (that's TurboQuant's point).
    assert mse_tq < mse_int4
    assert mse_tq < 0.02  # ~16-level optimal quantizer distortion


def test_tq3_roundtrip_reasonable():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 2, 128)).astype(np.float32)
    got = _roundtrip_tq(x, "tq3")
    mse = np.mean((got - x) ** 2)
    assert mse < 0.05  # 8-level optimal quantizer distortion ~0.034


@pytest.mark.parametrize("dtype", ["tq4", "tq3"])
def test_tq_cache_write_dequant(dtype):
    rng = np.random.default_rng(2)
    KH, D, bs = 2, 128, 16
    T = 24
    k = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    slots = jnp.asarray(np.arange(T) + bs, jnp.int32)

    cache = make_kv_cache(4, bs, KH, D, dtype, "float32")
    assert cache.data.dtype == jnp.uint8
    assert cache.codebook is not None
    cache = write_kv_xla(cache, k, v, slots)
    deq = np.asarray(dequant_block_kv(cache))
    kv = np.concatenate([np.asarray(k), np.asarray(v)], 1)  # split order
    rows = np.concatenate([deq[1].transpose(1, 0, 2),
                           deq[2].transpose(1, 0, 2)], axis=0)[:T]
    rel = np.abs(rows - kv) / (np.abs(kv).max(-1, keepdims=True) + 1e-9)
    assert rel.mean() < (0.05 if dtype == "tq4" else 0.11)


def test_tq4_attention_close_to_fp32():
    rng = np.random.default_rng(3)
    KH, D, bs = 2, 64, 16
    T = 24
    k = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    slots = jnp.asarray(np.arange(T), jnp.int32)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    qsl = jnp.asarray([0, 4], jnp.int32)
    sl = jnp.asarray([T], jnp.int32)
    q = jnp.asarray(rng.standard_normal((4, 4, D)), jnp.float32)

    ref_cache = write_kv_xla(
        jnp.zeros(kv_cache_shape(4, bs, KH, D), jnp.float32), k, v, slots)
    ref = np.asarray(ragged_paged_attention_xla(
        q, ref_cache, bt, qsl, sl, sm_scale=D ** -0.5))
    cache = write_kv_xla(make_kv_cache(4, bs, KH, D, "tq4", "float32"),
                         k, v, slots)
    got = np.asarray(ragged_paged_attention_xla(
        q, cache, bt, qsl, sl, sm_scale=D ** -0.5))
    # 16-level codebook on std-1 values: per-coordinate distortion
    # ~0.1 sigma propagates through softmax(QK)V; observed max ~0.26.
    assert np.abs(got - ref).max() < 0.4
    assert np.abs(got - ref).mean() < 0.05


def test_tq4_engine_e2e(cpu_devices):
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=8, num_kv_heads=4, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33,
                          cache_dtype="tq4"),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=2),
    )
    params = llama.random_params(cfg.model, seed=0)
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    rid = eng.add_request([3, 1, 4, 1, 5, 9, 2, 6],
                          SamplingParams(temperature=0.0, max_tokens=8,
                                         ignore_eos=True))
    toks = None
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                toks = out.outputs[0].token_ids
    assert toks is not None and len(toks) == 8
