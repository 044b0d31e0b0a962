"""Request tracing: OTel-semantic spans without a hard OTel dependency.

Ref analog: vllm/tracing/otel.py (SpanAttributes, init_tracer) +
the per-request span emitted in OutputProcessor/do_tracing. Spans carry
the reference's gen_ai.* attribute names so an OTLP backend ingests
them unchanged. Exporters:

- in-memory ring (tests, introspection)
- JSONL file (``trace_file`` / VLLM_TPU_TRACE_FILE)
- OTLP via opentelemetry-sdk *if installed* (optional import — this
  environment ships without it; the seam is the exporter interface)
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_tpu.utils import init_logger


def _envs_get(name, default=None):
    from vllm_tpu import envs
    v = getattr(envs, name)
    return v if v is not None else default

logger = init_logger(__name__)


class SpanAttributes:
    """Ref parity: vllm/tracing/otel.py SpanAttributes."""
    GEN_AI_REQUEST_ID = "gen_ai.request.id"
    GEN_AI_REQUEST_MODEL = "gen_ai.request.model"
    GEN_AI_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    GEN_AI_REQUEST_TOP_P = "gen_ai.request.top_p"
    GEN_AI_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    GEN_AI_REQUEST_N = "gen_ai.request.n"
    GEN_AI_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    GEN_AI_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    GEN_AI_USAGE_CACHED_TOKENS = "gen_ai.usage.cached_tokens"
    GEN_AI_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN = (
        "gen_ai.latency.time_to_first_token")
    GEN_AI_LATENCY_E2E = "gen_ai.latency.e2e"
    GEN_AI_LATENCY_TIME_PER_OUTPUT_TOKEN = (
        "gen_ai.latency.time_per_output_token")
    GEN_AI_RESPONSE_FINISH_REASON = "gen_ai.response.finish_reason"
    GEN_AI_NUM_PREEMPTIONS = "gen_ai.num_preemptions"


@dataclass
class Span:
    name: str
    start_ns: int
    end_ns: int
    attributes: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({
            "name": self.name,
            "start_ns": self.start_ns,
            "end_ns": self.end_ns,
            "attributes": self.attributes,
        })


class Tracer:
    """Collects finished spans; thread-safe (engine thread emits,
    frontend reads)."""

    def __init__(self, trace_file: Optional[str] = None,
                 ring_size: int = 1024,
                 otlp_endpoint: Optional[str] = None) -> None:
        self.trace_file = trace_file or _envs_get(
            "VLLM_TPU_TRACE_FILE")
        self.ring: deque[Span] = deque(maxlen=ring_size)
        self._lock = threading.Lock()
        self._fh = open(self.trace_file, "a") if self.trace_file else None
        self._otlp = None
        if otlp_endpoint:
            try:
                from opentelemetry import trace as otel_trace  # noqa: F401
                from opentelemetry.exporter.otlp.proto.grpc.\
                    trace_exporter import OTLPSpanExporter
                from opentelemetry.sdk.trace import TracerProvider
                from opentelemetry.sdk.trace.export import (
                    BatchSpanProcessor)
                provider = TracerProvider()
                provider.add_span_processor(
                    BatchSpanProcessor(
                        OTLPSpanExporter(endpoint=otlp_endpoint)))
                self._otlp = provider.get_tracer("vllm_tpu")
            except ImportError:
                logger.warning(
                    "otlp endpoint configured but opentelemetry not "
                    "installed; spans go to ring/file only")

    def emit(self, name: str, start_s: float, end_s: float,
             attributes: dict[str, Any]) -> Span:
        span = Span(name, int(start_s * 1e9), int(end_s * 1e9),
                    attributes)
        with self._lock:
            self.ring.append(span)
            if self._fh is not None:
                self._fh.write(span.to_json() + "\n")
                self._fh.flush()
        if self._otlp is not None:
            ot = self._otlp.start_span(name,
                                       start_time=span.start_ns)
            for k, v in attributes.items():
                ot.set_attribute(k, v)
            ot.end(end_time=span.end_ns)
        return span

    def request_span(self, *, req_id: str, model: str, params,
                     arrival_s: float, first_token_s: Optional[float],
                     finish_s: float, prompt_tokens: int,
                     completion_tokens: int, cached_tokens: int,
                     scheduled_s: Optional[float],
                     finish_reason: Optional[str],
                     num_preemptions: int = 0) -> Span:
        """One span per finished request with the reference's
        attribute set (ref: do_tracing, vllm/v1/engine/output_processor
        + otel.py)."""
        A = SpanAttributes
        attrs: dict[str, Any] = {
            A.GEN_AI_REQUEST_ID: req_id,
            A.GEN_AI_REQUEST_MODEL: model,
            A.GEN_AI_USAGE_PROMPT_TOKENS: prompt_tokens,
            A.GEN_AI_USAGE_COMPLETION_TOKENS: completion_tokens,
            A.GEN_AI_USAGE_CACHED_TOKENS: cached_tokens,
            A.GEN_AI_LATENCY_E2E: finish_s - arrival_s,
            A.GEN_AI_NUM_PREEMPTIONS: num_preemptions,
        }
        if params is not None:
            attrs[A.GEN_AI_REQUEST_TEMPERATURE] = params.temperature
            attrs[A.GEN_AI_REQUEST_TOP_P] = params.top_p
            attrs[A.GEN_AI_REQUEST_MAX_TOKENS] = params.max_tokens
        if scheduled_s is not None:
            attrs[A.GEN_AI_LATENCY_TIME_IN_QUEUE] = (scheduled_s -
                                                     arrival_s)
        if first_token_s is not None:
            attrs[A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] = (
                first_token_s - arrival_s)
            if completion_tokens > 1:
                attrs[A.GEN_AI_LATENCY_TIME_PER_OUTPUT_TOKEN] = (
                    (finish_s - first_token_s) /
                    (completion_tokens - 1))
        if finish_reason:
            attrs[A.GEN_AI_RESPONSE_FINISH_REASON] = finish_reason
        return self.emit("llm_request", arrival_s, finish_s, attrs)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


_PROFILE_ACTIVE = False


def start_profile(log_dir: Optional[str] = None) -> str:
    """jax.profiler trace start (ref analog: EngineCore.profile /
    start_profile endpoints; on TPU the trace captures XLA + host)."""
    global _PROFILE_ACTIVE
    import jax
    d = (log_dir or _envs_get("VLLM_TPU_PROFILE_DIR")
         or "/tmp/vllm_tpu_profile")
    if not _PROFILE_ACTIVE:
        jax.profiler.start_trace(d)
        _PROFILE_ACTIVE = True
    return d


def stop_profile() -> None:
    global _PROFILE_ACTIVE
    import jax
    if _PROFILE_ACTIVE:
        jax.profiler.stop_trace()
        _PROFILE_ACTIVE = False
