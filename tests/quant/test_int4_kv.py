"""int4 per-token-head KV cache with RHT pre-rotation.

Ref analog: vllm/v1/attention/ops/int4_per_token_head.py (nibble pack
+ random Hadamard rotation) / TurboQuant incoherence processing. The
rotation lives entirely inside write/dequant: consumers stay in the
original basis.
"""

import numpy as np

import jax.numpy as jnp

from vllm_tpu.ops.attention import ragged_paged_attention_xla
from vllm_tpu.ops.kv_cache import (_rht_matrix, dequant_block_kv,
                                   make_kv_cache, quantize_rows_int4,
                                   write_kv_xla)


def test_rht_orthonormal():
    H = np.asarray(_rht_matrix(128))
    np.testing.assert_allclose(H @ H.T, np.eye(128), atol=1e-5)


def test_int4_write_dequant_roundtrip():
    rng = np.random.default_rng(0)
    KH, D, bs = 2, 128, 16
    T = 24
    k = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    slots = jnp.asarray(np.arange(T) + bs, jnp.int32)

    cache = make_kv_cache(4, bs, KH, D, "int4", "float32")
    assert cache.data.dtype == jnp.uint8
    # K/V-paired nibble pack: KH byte planes, full-lane trailing dim.
    assert cache.data.shape == (4, KH, bs, D)
    cache = write_kv_xla(cache, k, v, slots)
    deq = np.asarray(dequant_block_kv(cache))  # [B, 2KH, bs, Dp]

    kv = np.concatenate([np.asarray(k), np.asarray(v)], 1)  # split order
    got = np.concatenate([deq[1], deq[2, :, :T - bs]], axis=1)  # [2KH, T?]
    # reshape: blocks 1..2 rows 0..bs hold tokens
    rows = np.concatenate([deq[1].transpose(1, 0, 2),
                           deq[2].transpose(1, 0, 2)], axis=0)[:T]
    err = np.abs(rows - kv)
    amax = np.abs(kv).max(-1, keepdims=True)
    # int4 after RHT: error well under amax/7 per coordinate on average
    assert (err / (amax + 1e-9)).mean() < 0.05
    assert (err / (amax + 1e-9)).max() < 0.5


def test_int4_attention_close_to_fp32():
    rng = np.random.default_rng(1)
    KH, D, bs = 2, 64, 16
    T = 24
    k = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    slots = jnp.asarray(np.arange(T) + bs, jnp.int32)
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    cache32 = write_kv_xla(
        jnp.zeros(kv_cache_shape(4, bs, KH, D), jnp.float32), k, v,
        slots)
    cache4 = write_kv_xla(make_kv_cache(4, bs, KH, D, "int4", "float32"),
                          k, v, slots)
    q = jnp.asarray(rng.standard_normal((T, 4, D)), jnp.float32)
    bt = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    qsl = jnp.asarray([0, T], jnp.int32)
    sl = jnp.asarray([T], jnp.int32)
    out32 = ragged_paged_attention_xla(q, cache32, bt, qsl, sl,
                                       sm_scale=0.125)
    out4 = ragged_paged_attention_xla(q, cache4, bt, qsl, sl,
                                      sm_scale=0.125)
    err = np.abs(np.asarray(out4) - np.asarray(out32))
    # 4-bit KV on gaussian data: coarse worst-case (softmax amplifies
    # score noise) but small on average.
    assert err.max() < 0.6, err.max()
    assert err.mean() < 0.05, err.mean()


def test_engine_e2e_int4_kv():
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2,
                          max_model_len=128, dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65,
                          cache_dtype="int4"),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
    )
    params = llama.random_params(cfg.model, seed=3)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    rid = engine.add_request([1, 9, 17, 33, 42],
                             SamplingParams(temperature=0.0,
                                            max_tokens=8,
                                            ignore_eos=True))
    done = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done = o.outputs[0].token_ids
    assert done is not None and len(done) == 8
