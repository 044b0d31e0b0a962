"""Tracing + observability: per-request gen_ai.* spans, KV-hit
metrics, profiler hooks (ref analog: vllm/tracing/otel.py + tests)."""

import json
import os

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             ObservabilityConfig, SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.tracing import SpanAttributes as A


def make_cfg(trace_file=None) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_model_len=128,
            dtype="float32",
        ),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
        observability=ObservabilityConfig(enable_tracing=True,
                                          trace_file=trace_file),
    )


def run(engine, prompt, max_tokens=6, temperature=0.7):
    rid = engine.add_request(
        prompt,
        SamplingParams(temperature=temperature, seed=1,
                       max_tokens=max_tokens, ignore_eos=True))
    while engine.has_unfinished_requests():
        engine.step()
    return rid


def test_request_spans(tmp_path):
    tf = str(tmp_path / "trace.jsonl")
    cfg = make_cfg(trace_file=tf)
    params = llama.random_params(cfg.model, seed=3)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    prompt = [(i * 3 + 1) % 250 for i in range(40)]
    rid1 = run(engine, prompt)
    rid2 = run(engine, prompt)  # prefix-cache hit

    spans = list(engine.tracer.ring)
    assert len(spans) == 2
    s1 = next(s for s in spans
              if s.attributes[A.GEN_AI_REQUEST_ID] == rid1)
    s2 = next(s for s in spans
              if s.attributes[A.GEN_AI_REQUEST_ID] == rid2)
    a1 = s1.attributes
    assert a1[A.GEN_AI_USAGE_PROMPT_TOKENS] == 40
    assert a1[A.GEN_AI_USAGE_COMPLETION_TOKENS] == 6
    assert a1[A.GEN_AI_RESPONSE_FINISH_REASON] == "length"
    assert a1[A.GEN_AI_REQUEST_TEMPERATURE] == 0.7
    assert a1[A.GEN_AI_LATENCY_E2E] > 0
    assert a1[A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] > 0
    assert A.GEN_AI_LATENCY_TIME_PER_OUTPUT_TOKEN in a1
    # Second identical prompt hits the device prefix cache.
    assert s2.attributes[A.GEN_AI_USAGE_CACHED_TOKENS] >= 32
    assert a1[A.GEN_AI_USAGE_CACHED_TOKENS] == 0

    # JSONL exporter wrote both.
    lines = [json.loads(l) for l in open(tf)]
    assert len(lines) == 2
    assert lines[0]["name"] == "llm_request"

    # /metrics exposition carries the KV-hit counters.
    text = engine.metrics.prometheus_text()
    assert "cached_tokens_total" in text
    assert "request_queue_time_seconds" in text
    assert "host_kv_swap_ins_total" in text


def test_profiler_hooks(tmp_path):
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    d = str(tmp_path / "prof")
    assert engine.start_profile(d) == d
    run(engine, [1, 2, 3, 4], max_tokens=2)
    engine.stop_profile()
    assert os.path.isdir(d) and os.listdir(d), "no profile written"
