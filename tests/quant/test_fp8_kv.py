"""fp8 (e4m3) quantized KV cache: attention closeness + engine E2E.

Ref analog: the reference's fp8 cache dtype family
(vllm/config/cache.py CacheDType) and BaseKVCacheMethod scales
(kv_cache.py:42) — scale 1.0 flavor here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.ops.attention import ragged_paged_attention_xla
from vllm_tpu.ops.kv_cache import (kv_cache_jnp_dtype, kv_cache_shape,
                                   write_kv_xla)
from vllm_tpu.ops.pallas.ragged_attention import ragged_paged_attention


def test_cache_dtype_resolution():
    assert kv_cache_jnp_dtype("auto", "bfloat16") == jnp.bfloat16
    assert kv_cache_jnp_dtype("fp8", "bfloat16") == jnp.float8_e4m3fn
    with pytest.raises(NotImplementedError):
        kv_cache_jnp_dtype("int3", "bfloat16")


def test_fp8_write_and_attend_close_to_fp32():
    rng = np.random.default_rng(0)
    KH, D, bs = 2, 64, 16
    T = 24
    k = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    slots = jnp.asarray(np.arange(T) + bs, jnp.int32)  # block 1+

    shape = kv_cache_shape(4, bs, KH, D)
    cache32 = write_kv_xla(jnp.zeros(shape, jnp.float32), k, v, slots)
    cache8 = write_kv_xla(jnp.zeros(shape, jnp.float8_e4m3fn), k, v, slots)

    q = jnp.asarray(rng.standard_normal((T, 4, D)), jnp.float32)
    bt = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    qsl = jnp.asarray([0, T], jnp.int32)
    sl = jnp.asarray([T], jnp.int32)
    out32 = ragged_paged_attention_xla(q, cache32, bt, qsl, sl,
                                       sm_scale=0.125)
    out8 = ragged_paged_attention_xla(q, cache8, bt, qsl, sl,
                                      sm_scale=0.125)
    # e4m3 has ~2 decimal digits; attention averages the error down.
    err = np.abs(np.asarray(out8) - np.asarray(out32)).max()
    assert err < 0.15, err
    # Pallas kernel agrees with its own XLA ref on the fp8 cache.
    outp = ragged_paged_attention(q, cache8, bt, qsl, sl, sm_scale=0.125,
                                  q_blk=16, f_blocks=2, interpret=True)
    np.testing.assert_allclose(np.asarray(outp[:T]), np.asarray(out8),
                               rtol=2e-4, atol=2e-4)


def test_engine_e2e_fp8_kv():
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    def gen(cache_dtype):
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=512, hidden_size=128,
                              intermediate_size=256, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=33,
                              cache_dtype=cache_dtype),
            scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                      max_num_seqs=4),
        )
        params = llama.random_params(cfg.model, seed=3)
        engine = LLMEngine(cfg, params=params, tokenizer=None)
        rid = engine.add_request([1, 9, 17, 200, 33],
                                 SamplingParams(temperature=0.0,
                                                max_tokens=10,
                                                ignore_eos=True))
        toks = None
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    toks = o.outputs[0].token_ids
        return toks

    full = gen("auto")
    quant = gen("fp8")
    assert len(quant) == 10
    # Greedy trajectories usually agree for a few tokens before fp8
    # rounding may fork them; require a shared prefix.
    shared = sum(1 for a, b in zip(full, quant) if a == b)
    assert shared >= 2, (full, quant)
