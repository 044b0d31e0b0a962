"""Fault tolerance: sentinel retry + engine re-init (ref analog:
EngineCoreSentinel fault_tolerant_wrapper/retry,
v1/fault_tolerance/engine_core_sentinel.py)."""

import asyncio

import numpy as np

import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def make_engine():
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
    )
    params = llama.random_params(cfg.model, seed=0)
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    cfg.model.eos_token_ids = []
    return eng


def _run(eng, n=2, tag="r"):
    rng = np.random.default_rng(0)
    for i in range(n):
        eng.add_request([int(x) for x in rng.integers(10, 500, 8)],
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True),
                        request_id=f"{tag}-{i}")
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    return outs


def test_reinitialize_resets_and_serves(monkeypatch):
    eng = make_engine()
    outs = _run(eng, tag="before")
    assert len(outs) == 2
    free_before = eng.scheduler.kv_cache_manager.block_pool.num_free_blocks

    # Mid-flight fault: add requests, step once, then re-init.
    rng = np.random.default_rng(1)
    eng.add_request([int(x) for x in rng.integers(10, 500, 8)],
                    SamplingParams(max_tokens=4, ignore_eos=True),
                    request_id="victim")
    eng.step()
    eng.reinitialize()
    assert not eng.has_unfinished_requests()
    pool = eng.scheduler.kv_cache_manager.block_pool
    assert pool.num_free_blocks == free_before  # fresh bookkeeping

    outs = _run(eng, tag="after")
    assert len(outs) == 2
    assert all(len(o.outputs[0].token_ids) == 4 for o in outs.values())


def test_async_sentinel_reinit_recovers(monkeypatch):
    """3 consecutive step failures trigger one engine re-init; the
    loop keeps serving afterwards."""
    from vllm_tpu.engine.async_llm import AsyncLLM

    async def main():
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=512, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=65),
            scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                      max_num_seqs=4),
        )
        params = llama.random_params(cfg.model, seed=0)
        allm = AsyncLLM(cfg, params=params, tokenizer=None)
        cfg.model.eos_token_ids = []
        real_execute = allm.engine.runner.execute_model
        state = {"failures_left": 3}

        def flaky(out):
            if state["failures_left"] > 0:
                state["failures_left"] -= 1
                raise RuntimeError("injected device fault")
            return real_execute(out)

        allm.engine.runner.execute_model = flaky
        try:
            # Each injected failure aborts its own in-flight request;
            # the third consecutive failure trips the retry tier.
            for i in range(3):
                with pytest.raises(RuntimeError):
                    async for _ in allm.generate(
                            [1, 2, 3, 4],
                            SamplingParams(max_tokens=4,
                                           ignore_eos=True),
                            request_id=f"dead-{i}"):
                        pass
            # Loop re-initialized; later requests succeed.
            final = None
            async for out in allm.generate(
                    [5, 6, 7, 8],
                    SamplingParams(max_tokens=4, ignore_eos=True),
                    request_id="alive"):
                final = out
            assert final is not None and final.finished
            assert len(final.outputs[0].token_ids) == 4
            assert allm._reinit_attempts == 1
        finally:
            allm.shutdown()

    asyncio.run(main())
