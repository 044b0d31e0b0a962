"""Serving metric definitions — adopted verbatim from the reference
(BASELINE.md; ref: docs/benchmarking/cli.md:123-135,
vllm/benchmarks/serve.py:327,562-639):

- TTFT: request send -> first streamed token
- ITL: gap between consecutive streamed outputs
- TPOT: (e2e latency - TTFT) / (output tokens - 1), per request
- goodput: completed requests meeting ttft/tpot/e2el SLOs
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class RequestTrace:
    send_time: float
    token_times: list[float] = field(default_factory=list)
    num_output_tokens: int = 0

    @property
    def ttft(self) -> Optional[float]:
        if not self.token_times:
            return None
        return self.token_times[0] - self.send_time

    @property
    def e2e_latency(self) -> Optional[float]:
        if not self.token_times:
            return None
        return self.token_times[-1] - self.send_time

    @property
    def tpot(self) -> Optional[float]:
        if self.num_output_tokens < 2 or not self.token_times:
            return None
        return (self.e2e_latency - self.ttft) / (self.num_output_tokens - 1)

    @property
    def itls(self) -> list[float]:
        return [
            b - a for a, b in zip(self.token_times, self.token_times[1:])
        ]


def percentiles(values: list[float],
                ps=(50, 90, 99)) -> dict[str, float]:
    if not values:
        return {f"p{p}": float("nan") for p in ps}
    arr = np.asarray(values)
    out = {f"p{p}": float(np.percentile(arr, p)) for p in ps}
    out["mean"] = float(arr.mean())
    return out


def summarize(traces: list[RequestTrace],
              wall_time: float) -> dict:
    done = [t for t in traces if t.token_times]
    total_out = sum(t.num_output_tokens for t in done)
    return {
        "completed": len(done),
        "duration_s": round(wall_time, 3),
        "request_throughput_rps": round(len(done) / wall_time, 3),
        "output_tok_per_s": round(total_out / wall_time, 2),
        "ttft_ms": {k: round(v * 1000, 2) for k, v in
                    percentiles([t.ttft for t in done]).items()},
        "tpot_ms": {k: round(v * 1000, 2) for k, v in
                    percentiles([t.tpot for t in done
                                 if t.tpot is not None]).items()},
        "itl_ms": {k: round(v * 1000, 2) for k, v in
                   percentiles([i for t in done
                                for i in t.itls]).items()},
    }
