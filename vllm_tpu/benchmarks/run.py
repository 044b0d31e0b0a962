"""Benchmark drivers: latency / throughput / serve.

Ref analog: vllm bench {latency,throughput,serve}
(vllm/benchmarks/*, SURVEY.md §6). All three run against the in-process
engine; `serve` applies a Poisson arrival process and streams through
AsyncLLM to measure TTFT/TPOT/ITL.
"""

from __future__ import annotations

import asyncio
import json
import random
import time

from vllm_tpu.benchmarks.metrics import RequestTrace, summarize
from vllm_tpu.sample.params import SamplingParams


def _random_prompts(num: int, input_len: int, vocab: int,
                    seed: int = 0) -> list[list[int]]:
    rng = random.Random(seed)
    return [[rng.randrange(10, vocab - 10) for _ in range(input_len)]
            for _ in range(num)]


def bench_latency(llm, input_len=32, output_len=128, iters=8,
                  warmup=2) -> dict:
    """Batch-1 end-to-end latency (ref: latency-tests.json 32/128)."""
    vocab = llm.engine.config.model.vocab_size
    sp = SamplingParams(temperature=0.0, max_tokens=output_len,
                        ignore_eos=True)
    lat = []
    for i in range(warmup + iters):
        prompt = _random_prompts(1, input_len, vocab, seed=i)[0]
        t0 = time.perf_counter()
        llm.generate([prompt], sp)
        dt = time.perf_counter() - t0
        if i >= warmup:
            lat.append(dt)
    lat.sort()
    return {
        "avg_latency_s": round(sum(lat) / len(lat), 4),
        "p50_latency_s": round(lat[len(lat) // 2], 4),
        "iters": iters,
    }


def bench_throughput(llm, num_prompts=64, input_len=128,
                     output_len=128) -> dict:
    """Offline batch throughput (ref: 200-prompt ShareGPT suite)."""
    vocab = llm.engine.config.model.vocab_size
    prompts = _random_prompts(num_prompts, input_len, vocab)
    sp = SamplingParams(temperature=0.0, max_tokens=output_len,
                        ignore_eos=True)
    # warmup (compile all buckets)
    llm.generate(prompts[:2], sp)
    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp)
    dt = time.perf_counter() - t0
    out_toks = sum(len(o.outputs[0].token_ids) for o in outs)
    total_toks = out_toks + num_prompts * input_len
    return {
        "requests_per_s": round(num_prompts / dt, 3),
        "total_tok_per_s": round(total_toks / dt, 1),
        "output_tok_per_s": round(out_toks / dt, 1),
        "duration_s": round(dt, 2),
    }


async def bench_serve_async(async_llm, num_prompts=32, input_len=64,
                            output_len=32, request_rate=8.0,
                            seed=0) -> dict:
    """Online serving bench: Poisson arrivals, streamed tokens."""
    vocab = async_llm.engine.config.model.vocab_size
    prompts = _random_prompts(num_prompts, input_len, vocab, seed)
    sp = SamplingParams(temperature=0.0, max_tokens=output_len,
                        ignore_eos=True)
    rng = random.Random(seed)
    traces: list[RequestTrace] = []

    async def one(prompt, delay) -> RequestTrace:
        await asyncio.sleep(delay)
        trace = RequestTrace(send_time=time.perf_counter())
        n_tokens = 0
        async for out in async_llm.generate(prompt, sp):
            now = time.perf_counter()
            new = len(out.outputs[0].token_ids) - n_tokens
            n_tokens = len(out.outputs[0].token_ids)
            for _ in range(new):
                trace.token_times.append(now)
        trace.num_output_tokens = n_tokens
        return trace

    t0 = time.perf_counter()
    delay = 0.0
    tasks = []
    for p in prompts:
        tasks.append(asyncio.create_task(one(p, delay)))
        delay += rng.expovariate(request_rate)
    traces = list(await asyncio.gather(*tasks))
    wall = time.perf_counter() - t0
    return summarize(traces, wall)


def bench_serve(async_llm, **kw) -> dict:
    return asyncio.run(bench_serve_async(async_llm, **kw))


def print_result(name: str, result: dict) -> None:
    print(f"== bench {name} ==")
    print(json.dumps(result, indent=2))
