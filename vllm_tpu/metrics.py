"""Engine metrics: counters/gauges/histograms + Prometheus exposition.

Ref analog: vllm/v1/metrics/ (StatLoggerBase:44, LoggingStatLogger:99,
prometheus.py; stat dataclasses stats.py). No prometheus_client dep —
the exposition text format is rendered directly, served by the HTTP
frontend at /metrics.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


@dataclass
class Histogram:
    buckets: tuple[float, ...]
    counts: list[int] = field(default_factory=list)
    total: float = 0.0
    n: int = 0

    def __post_init__(self) -> None:
        if not self.counts:
            self.counts = [0] * (len(self.buckets) + 1)

    def observe(self, v: float) -> None:
        self.total += v
        self.n += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1


LATENCY_BUCKETS = (0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0,
                   2.5, 5.0, 10.0, 30.0, 60.0)


class EngineMetrics:
    """Aggregated engine counters, updated by LLMEngine.step().

    With a tracer attached, emits one gen_ai.* span per finished
    request (ref analog: do_tracing, vllm/v1/engine/output_processor).
    """

    def __init__(self, tracer=None, model_name: str = "") -> None:
        self.tracer = tracer
        self.model_name = model_name
        self.num_requests_total = 0
        self.num_finished_total = 0
        self.num_preemptions_total = 0
        self.prompt_tokens_total = 0
        self.generation_tokens_total = 0
        self.spec_proposed_total = 0
        self.spec_accepted_total = 0
        self.num_steps_total = 0
        # gauges (set each step)
        self.num_running = 0
        self.num_waiting = 0
        self.kv_cache_usage = 0.0
        self.prefix_cache_hits = 0
        self.prefix_cache_queries = 0
        self.cached_tokens_total = 0  # per-request KV hits, in tokens
        self.host_kv_blocks = 0
        self.host_kv_swap_ins = 0
        self.host_kv_stores = 0
        self.queue_time = Histogram(LATENCY_BUCKETS)
        self.ttft = Histogram(LATENCY_BUCKETS)
        self.tpot = Histogram(LATENCY_BUCKETS)
        self.step_time = Histogram(LATENCY_BUCKETS)
        # per-request first-token bookkeeping
        self._req_arrival: dict[str, float] = {}
        self._req_first_tok: dict[str, float] = {}
        self._req_ntok: dict[str, int] = {}
        self._req_nprompt: dict[str, int] = {}
        self._req_params: dict[str, object] = {}

    # -- engine hooks -------------------------------------------------
    def on_request_added(self, req_id: str, num_prompt_tokens: int,
                         params=None) -> None:
        self.num_requests_total += 1
        self.prompt_tokens_total += num_prompt_tokens
        self._req_arrival[req_id] = time.monotonic()
        self._req_nprompt[req_id] = num_prompt_tokens
        if self.tracer is not None:
            self._req_params[req_id] = params

    def on_step(self, outputs, sched_stats, step_dt: float) -> None:
        now = time.monotonic()
        self.num_steps_total += 1
        self.step_time.observe(step_dt)
        self.num_running = sched_stats.num_running_reqs
        self.num_waiting = sched_stats.num_waiting_reqs
        self.kv_cache_usage = sched_stats.kv_cache_usage
        self.prefix_cache_hits = sched_stats.prefix_cache_hits
        self.prefix_cache_queries = sched_stats.prefix_cache_queries
        self.num_preemptions_total = sched_stats.num_preemptions
        self.host_kv_blocks = sched_stats.host_kv_blocks
        self.host_kv_swap_ins = sched_stats.host_kv_swap_ins
        self.host_kv_stores = sched_stats.host_kv_stores
        for out in outputs:
            n_new = len(out.new_token_ids)
            self.generation_tokens_total += n_new
            rid = out.req_id
            if rid not in self._req_first_tok and n_new:
                self._req_first_tok[rid] = now
                arr = self._req_arrival.get(rid)
                if arr is not None:
                    self.ttft.observe(now - arr)
            self._req_ntok[rid] = self._req_ntok.get(rid, 0) + n_new
            if out.finished:
                self.num_finished_total += 1
                first = self._req_first_tok.pop(rid, None)
                arr = self._req_arrival.pop(rid, None)
                ntok = self._req_ntok.pop(rid, 0)
                nprompt = self._req_nprompt.pop(rid, 0)
                if first is not None and ntok > 1:
                    self.tpot.observe((now - first) / (ntok - 1))
                self.cached_tokens_total += out.kv_cached_tokens
                sched_t = out.scheduled_time
                if arr is not None and sched_t is not None:
                    self.queue_time.observe(sched_t - arr)
                if self.tracer is not None and arr is not None:
                    self.tracer.request_span(
                        req_id=rid,
                        model=self.model_name,
                        params=self._req_params.pop(rid, None),
                        arrival_s=arr,
                        first_token_s=first,
                        finish_s=now,
                        prompt_tokens=nprompt,
                        completion_tokens=ntok,
                        cached_tokens=out.kv_cached_tokens,
                        scheduled_s=sched_t,
                        finish_reason=out.finish_reason,
                        num_preemptions=out.num_preemptions,
                    )

    # -- rendering ----------------------------------------------------
    def prometheus_text(self, prefix: str = "vllm_tpu") -> str:
        lines = []

        def counter(name, v, help_=""):
            lines.append(f"# TYPE {prefix}:{name} counter")
            lines.append(f"{prefix}:{name} {v}")

        def gauge(name, v):
            lines.append(f"# TYPE {prefix}:{name} gauge")
            lines.append(f"{prefix}:{name} {v}")

        def hist(name, h: Histogram):
            lines.append(f"# TYPE {prefix}:{name} histogram")
            cum = 0
            for b, c in zip(h.buckets, h.counts):
                cum += c
                lines.append(f'{prefix}:{name}_bucket{{le="{b}"}} {cum}')
            cum += h.counts[-1]
            lines.append(f'{prefix}:{name}_bucket{{le="+Inf"}} {cum}')
            lines.append(f"{prefix}:{name}_sum {h.total}")
            lines.append(f"{prefix}:{name}_count {h.n}")

        counter("request_success_total", self.num_finished_total)
        counter("num_requests_total", self.num_requests_total)
        counter("num_preemptions_total", self.num_preemptions_total)
        counter("prompt_tokens_total", self.prompt_tokens_total)
        counter("generation_tokens_total", self.generation_tokens_total)
        counter("engine_steps_total", self.num_steps_total)
        gauge("num_requests_running", self.num_running)
        gauge("num_requests_waiting", self.num_waiting)
        gauge("kv_cache_usage_perc", round(self.kv_cache_usage, 4))
        counter("prefix_cache_hits_total", self.prefix_cache_hits)
        counter("prefix_cache_queries_total", self.prefix_cache_queries)
        counter("cached_tokens_total", self.cached_tokens_total)
        gauge("host_kv_blocks", self.host_kv_blocks)
        counter("host_kv_swap_ins_total", self.host_kv_swap_ins)
        counter("host_kv_stores_total", self.host_kv_stores)
        hist("request_queue_time_seconds", self.queue_time)
        hist("time_to_first_token_seconds", self.ttft)
        hist("time_per_output_token_seconds", self.tpot)
        hist("engine_step_seconds", self.step_time)
        return "\n".join(lines) + "\n"


class LoggingStatLogger:
    """Interval log lines (ref analog: LoggingStatLogger:99)."""

    def __init__(self, metrics: EngineMetrics,
                 interval_s: float = 10.0) -> None:
        self.metrics = metrics
        self.interval_s = interval_s
        self._last = time.monotonic()
        self._last_gen = 0
        self._last_prompt = 0

    def maybe_log(self) -> Optional[str]:
        now = time.monotonic()
        if now - self._last < self.interval_s:
            return None
        dt = now - self._last
        m = self.metrics
        gen_rate = (m.generation_tokens_total - self._last_gen) / dt
        prompt_rate = (m.prompt_tokens_total - self._last_prompt) / dt
        self._last, self._last_gen, self._last_prompt = (
            now, m.generation_tokens_total, m.prompt_tokens_total)
        msg = (f"tput: {prompt_rate:.1f} prompt tok/s, "
               f"{gen_rate:.1f} gen tok/s | running {m.num_running}, "
               f"waiting {m.num_waiting} | kv usage "
               f"{m.kv_cache_usage*100:.1f}% | preempts "
               f"{m.num_preemptions_total}")
        logger.info(msg)
        return msg
