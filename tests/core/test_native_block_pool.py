"""Native (C++) block pool: differential parity vs the Python pool +
engine equivalence under VLLM_TPU_NATIVE_POOL=1."""

import os

import numpy as np
import pytest

from vllm_tpu.core.block_pool import BlockPool, hash_block_tokens

pytestmark = pytest.mark.skipif(
    not __import__("vllm_tpu.core.native_pool",
                   fromlist=["native_pool_available"]
                   ).native_pool_available(),
    reason="g++ toolchain unavailable")


def make_native(n, caching=True):
    from vllm_tpu.core.native_pool import NativeBlockPool
    return NativeBlockPool(n, caching)


def test_randomized_differential():
    """Same randomized op sequence drives both pools; allocation
    order, cache hits, free counts, and eviction streams must agree."""
    rng = np.random.default_rng(0)
    N = 33
    py = BlockPool(N)
    nat = make_native(N)
    py_ev, nat_ev = [], []
    py.on_evict = lambda bid, h: py_ev.append((bid, h))
    nat.on_evict = lambda bid, h: nat_ev.append((bid, h))

    held_py: list[list] = []
    held_nat: list[list] = []
    hash_seq = [
        hash_block_tokens(None, (int(x), ), None, "builtin")
        for x in rng.integers(0, 1000, 200)
    ]

    for step in range(300):
        op = rng.integers(0, 4)
        if op == 0 and py.num_free_blocks > 3:  # allocate + cache
            k = int(rng.integers(1, 4))
            a = py.get_new_blocks(k)
            b = nat.get_new_blocks(k)
            assert [x.block_id for x in a] == [x.block_id for x in b]
            hs = [hash_seq[int(rng.integers(0, len(hash_seq)))]
                  for _ in range(k)]
            py.cache_full_blocks(a, hs, 0, k)
            nat.cache_full_blocks(b, hs, 0, k)
            held_py.append(a)
            held_nat.append(b)
        elif op == 1 and held_py:  # free one group
            i = int(rng.integers(0, len(held_py)))
            py.free_blocks(list(reversed(held_py.pop(i))))
            nat.free_blocks(list(reversed(held_nat.pop(i))))
        elif op == 2:  # lookup
            h = hash_seq[int(rng.integers(0, len(hash_seq)))]
            a = py.get_cached_block(h)
            b = nat.get_cached_block(h)
            assert (a is None) == (b is None)
            if a is not None:
                assert a.block_id == b.block_id
                # touch through the hit (like allocate_slots)
                py.touch([a])
                nat.touch([b])
                held_py.append([a])
                held_nat.append([b])
        else:
            assert py.num_free_blocks == nat.num_free_blocks
    assert py.num_free_blocks == nat.num_free_blocks
    assert py_ev == nat_ev, "eviction streams diverge"
    assert py.stats.evictions == nat.stats.evictions


def test_engine_with_native_pool():
    """Full engine greedy parity with the native pool selected."""
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    def cfg():
        return EngineConfig(
            model=ModelConfig(vocab_size=256, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=65),
            scheduler=SchedulerConfig(max_num_batched_tokens=64,
                                      max_num_seqs=4),
        )

    params = llama.random_params(cfg().model, seed=3)

    def gen():
        engine = LLMEngine(cfg(), params=params, tokenizer=None)
        prompts = [[(i * 7 + j) % 250 for i in range(40)]
                   for j in range(3)]
        ids = [
            engine.add_request(
                p, SamplingParams(temperature=0.0, max_tokens=8,
                                  ignore_eos=True)) for p in prompts
        ]
        done = {}
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    done[o.request_id] = o.outputs[0].token_ids
        kind = type(engine.scheduler.kv_cache_manager.block_pool).__name__
        return [done[i] for i in ids], kind

    os.environ["VLLM_TPU_NATIVE_POOL"] = "0"
    try:
        ref, kind0 = gen()
        assert kind0 == "BlockPool"
        os.environ["VLLM_TPU_NATIVE_POOL"] = "1"
        got, kind1 = gen()
    finally:
        del os.environ["VLLM_TPU_NATIVE_POOL"]
    assert kind1 == "NativeBlockPool"
    assert got == ref
