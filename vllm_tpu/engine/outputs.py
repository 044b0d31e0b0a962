"""User-facing request outputs (ref analog: vllm/outputs.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: list[int]
    finish_reason: Optional[str] = None
    stop_reason: Optional[int | str] = None
    cumulative_logprob: Optional[float] = None
    # per output token: {token_id: logprob} incl. sampled + top-k
    logprobs: Optional[list[dict[int, float]]] = None


@dataclass
class RequestOutput:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: list[int]
    outputs: list[CompletionOutput] = field(default_factory=list)
    finished: bool = False
    # Pooling/embedding requests only (ref analog:
    # PoolingRequestOutput, vllm/outputs.py).
    embedding: Optional[list[float]] = None
    # Per prompt position {token_id: logprob} (entry 0 None);
    # populated when SamplingParams.prompt_logprobs is set (ref:
    # vllm RequestOutput.prompt_logprobs).
    prompt_logprobs: Optional[list] = None
