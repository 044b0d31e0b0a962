"""Async (overlapped) scheduling: schedule step N+1 while step N runs.

Ref analog: vllm/v1/core/sched/async_scheduler.py (output placeholders)
+ core.py step_with_batch_queue. Invariants:

1. Output-invariance: greedy generation with async_scheduling on equals
   the sync engine token-for-token (the device programs are identical;
   the only new op is an exact where() substituting the fed-back token).
2. Overlap actually happens: between engine.step() calls a real device
   StepHandle is outstanding.
3. Stops resolve correctly one step late (the wasted in-flight step's
   output for a finished request is dropped) and no KV blocks leak.
"""

import numpy as np

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def make_cfg(async_sched: bool, **sched_kw) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65,
                          enable_prefix_caching=True),
        scheduler=SchedulerConfig(max_num_batched_tokens=64,
                                  max_num_seqs=4,
                                  multi_step_decode_horizon=1,
                                  async_scheduling=async_sched,
                                  **sched_kw),
    )


PROMPTS = [[1, 9, 17, 33, 42, 5, 6, 7], [7, 7, 7],
           [100, 101, 102, 103, 104], [11, 12]]
MAX_TOKS = [12, 5, 9, 7]


def run(cfg, params, temperature=0.0, staggered=True):
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    ids = []
    done: dict[str, list[int]] = {}
    overlapped = 0
    pending = list(zip(PROMPTS, MAX_TOKS))
    step = 0
    # Staggered adds: new prefills arrive while decodes are in flight.
    while pending or engine.has_unfinished_requests():
        if pending and (not staggered or step % 2 == 0):
            p, mt = pending.pop(0)
            ids.append(
                engine.add_request(
                    p,
                    SamplingParams(temperature=temperature, seed=7,
                                   max_tokens=mt, ignore_eos=True)))
        for o in engine.step():
            if o.outputs:
                done.setdefault(o.request_id, [])
                done[o.request_id] = list(o.outputs[0].token_ids)
        infl = getattr(engine, "_inflight", None)
        if infl is not None and infl[1].result is None:
            overlapped += 1
        step += 1
        assert step < 500, "engine stalled"
    leak_free = (engine.scheduler.kv_cache_manager.block_pool.
                 num_free_blocks)
    total = engine.scheduler.kv_cache_manager.block_pool.num_blocks
    return [done[i] for i in ids], overlapped, leak_free, total


def test_async_greedy_matches_sync():
    cfg_s = make_cfg(False)
    params = llama.random_params(cfg_s.model, seed=3)
    ref, _, free_s, total_s = run(cfg_s, params)
    got, overlapped, free_a, total_a = run(make_cfg(True), params)
    assert [len(t) for t in ref] == MAX_TOKS
    assert got == ref
    assert overlapped > 0, "no step ever overlapped"
    assert free_a == total_a - 1  # null block stays reserved
    assert free_s == free_a


def test_async_sampled_runs_and_stops():
    """Random sampling under async mode: correct lengths, no stall."""
    cfg = make_cfg(True)
    params = llama.random_params(cfg.model, seed=3)
    got, overlapped, free, total = run(cfg, params, temperature=0.8)
    assert [len(t) for t in got] == MAX_TOKS
    assert overlapped > 0
    assert free == total - 1


def test_async_with_eos_stop():
    """EOS detected one step late must still stop the request and not
    leak the wasted in-flight step's blocks."""
    cfg = make_cfg(True)
    params = llama.random_params(cfg.model, seed=3)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    # Pick the greedy token the model emits first and use it as a stop.
    probe = LLMEngine(make_cfg(False), params=params, tokenizer=None)
    rid = probe.add_request(
        PROMPTS[0], SamplingParams(temperature=0.0, max_tokens=3,
                                   ignore_eos=True))
    toks = []
    while probe.has_unfinished_requests():
        for o in probe.step():
            if o.outputs:
                toks = list(o.outputs[0].token_ids)
    stop_tok = toks[1]
    rid = engine.add_request(
        PROMPTS[0],
        SamplingParams(temperature=0.0, max_tokens=32,
                       stop_token_ids=[stop_tok]))
    out_toks = []
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.outputs:
                out_toks = list(o.outputs[0].token_ids)
        steps += 1
        assert steps < 100
    assert out_toks[-1] == stop_tok and len(out_toks) == 2
    pool = engine.scheduler.kv_cache_manager.block_pool
    assert pool.num_free_blocks == pool.num_blocks - 1


def test_async_rejects_spec_decode():
    import pytest

    from vllm_tpu.config import SpeculativeConfig
    from vllm_tpu.core.scheduler import Scheduler
    cfg = make_cfg(True)
    cfg.speculative = SpeculativeConfig(method="ngram")
    with pytest.raises(ValueError, match="async_scheduling"):
        Scheduler(cfg, num_blocks=65)
