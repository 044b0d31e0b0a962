"""Host KV tier (CPU offload) + disaggregated P/D KV transfer.

Correctness gate: generation with swapped-in / injected KV must be
greedy-identical to computing the prefill locally — any byte error in
the moved blocks would perturb every subsequent attention read.
"""

import numpy as np

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def make_cfg(num_blocks=65, host_swap_bytes=0, cache_dtype="auto"):
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_model_len=160,
            dtype="float32",
        ),
        cache=CacheConfig(block_size=16, num_gpu_blocks=num_blocks,
                          host_swap_bytes=host_swap_bytes,
                          cache_dtype=cache_dtype),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
    )


def gen(engine, prompt, max_tokens=6):
    rid = engine.add_request(
        prompt,
        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       ignore_eos=True))
    out = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                out = o.outputs[0].token_ids
    return out


PROMPT_A = [(i * 7 + 1) % 250 for i in range(50)]  # 3 full blocks
PROMPT_B = [(i * 11 + 3) % 250 for i in range(140)]  # fills the pool


def test_host_tier_roundtrip_greedy_identical():
    params = llama.random_params(make_cfg().model, seed=3)
    ref = gen(LLMEngine(make_cfg(), params=params, tokenizer=None),
              PROMPT_A)

    # Tiny device pool + host tier: B evicts A's cached blocks.
    cfg = make_cfg(num_blocks=11, host_swap_bytes=64 * 2**20)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    assert engine.scheduler.host_kv_pool is not None
    out_a1 = gen(engine, PROMPT_A)
    assert out_a1 == ref
    gen(engine, PROMPT_B[:130])  # force eviction -> offload
    pool = engine.scheduler.host_kv_pool
    assert pool.stores > 0, "no blocks were offloaded"
    out_a2 = gen(engine, PROMPT_A)
    assert engine.scheduler.num_swap_ins > 0, "host tier never hit"
    assert out_a2 == ref


def test_host_tier_with_quantized_kv():
    """QuantKV caches round-trip (data + scale planes)."""
    params = llama.random_params(make_cfg().model, seed=3)
    cfg0 = make_cfg(cache_dtype="int8")
    ref = gen(LLMEngine(cfg0, params=params, tokenizer=None), PROMPT_A)
    cfg = make_cfg(num_blocks=11, host_swap_bytes=64 * 2**20,
                   cache_dtype="int8")
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    assert gen(engine, PROMPT_A) == ref
    gen(engine, PROMPT_B[:130])
    out = gen(engine, PROMPT_A)
    assert engine.scheduler.num_swap_ins > 0
    assert out == ref


def test_disagg_pd_transfer():
    """Prefill on engine P, decode on engine D with the transferred
    payload: output matches a single-engine run; D skips the prefill
    compute for the payload region."""
    params = llama.random_params(make_cfg().model, seed=5)
    ref = gen(LLMEngine(make_cfg(), params=params, tokenizer=None),
              PROMPT_A, max_tokens=8)

    p_engine = LLMEngine(make_cfg(), params=params, tokenizer=None)
    gen(p_engine, PROMPT_A, max_tokens=1)  # prefill pass
    payload = p_engine.extract_kv(PROMPT_A)
    assert payload is not None and payload.num_tokens == 48

    d_engine = LLMEngine(make_cfg(), params=params, tokenizer=None)
    rid = d_engine.add_request(
        PROMPT_A,
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
        kv_transfer=payload)
    toks: list[int] = []
    first = True
    while d_engine.has_unfinished_requests():
        sched = d_engine.scheduler.schedule()
        if first:
            # Only the non-payload tail runs through the model.
            assert sched.num_scheduled_tokens[rid] == len(PROMPT_A) - 48
            assert sched.kv_inject_reqs == [rid]
            first = False
        runner_out = d_engine.runner.execute_model(sched)
        for o in d_engine.scheduler.update_from_output(sched, runner_out):
            toks.extend(o.new_token_ids)
    assert toks == ref
