"""AsyncLLM streaming behavior + bench harness smoke tests."""

import asyncio

import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.async_llm import AsyncLLM
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


@pytest.fixture()
def async_llm():
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=8),
    )
    params = llama.random_params(cfg.model, seed=4)
    llm = AsyncLLM(cfg, params=params, tokenizer=None)
    yield llm
    llm.shutdown()


def test_streaming_generate(async_llm):
    async def main():
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        chunks = []
        async for out in async_llm.generate([1, 5, 9], sp):
            chunks.append(list(out.outputs[0].token_ids))
        # Streaming yields growing prefixes; final has 6 tokens.
        assert len(chunks[-1]) == 6
        for a, b in zip(chunks, chunks[1:]):
            assert b[:len(a)] == a
        return chunks[-1]

    toks = asyncio.run(main())
    assert len(toks) == 6


def test_concurrent_streams_interleave(async_llm):
    async def main():
        sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)

        async def one(p):
            last = None
            async for out in async_llm.generate(p, sp):
                last = out
            return last.outputs[0].token_ids

        results = await asyncio.gather(one([1, 2, 3]), one([9, 8]),
                                       one([100, 101, 102, 103]))
        return results

    results = asyncio.run(main())
    assert all(len(r) == 5 for r in results)


def test_bench_serve_metrics(async_llm):
    from vllm_tpu.benchmarks.run import bench_serve
    result = bench_serve(async_llm, num_prompts=6, input_len=8,
                         output_len=4, request_rate=100.0)
    assert result["completed"] == 6
    assert result["ttft_ms"]["p50"] > 0
    assert result["output_tok_per_s"] > 0
    # 4 output tokens -> 3 ITL gaps per request
    assert result["tpot_ms"]["p50"] >= 0


def test_fault_tolerance_step_failure(async_llm):
    """A failing step errors the affected request but the engine
    keeps serving subsequent requests."""
    import asyncio

    async def main():
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        # sabotage one step
        real_step = async_llm.engine.step
        calls = {"n": 0}

        def flaky_step():
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected fault")
            return real_step()

        async_llm.engine.step = flaky_step
        with pytest.raises(RuntimeError, match="injected fault"):
            async for _ in async_llm.generate([1, 2, 3], sp):
                pass
        # engine recovered: next request succeeds
        last = None
        async for out in async_llm.generate([4, 5, 6], sp):
            last = out
        assert last is not None and len(last.outputs[0].token_ids) == 4

    asyncio.run(main())
