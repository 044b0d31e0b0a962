"""Scheduler <-> model-runner interface types.

Ref analog: vllm/v1/core/sched/output.py (``SchedulerOutput``) and
vllm/v1/outputs.py (``ModelRunnerOutput``). Plain dataclasses of ids and
ints — the boundary the reference serializes over its shm ring; ours
crosses a function call (single-controller JAX) but keeps the same shape
so a multi-host control plane can serialize it later.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Optional

if TYPE_CHECKING:
    from vllm_tpu.sample.params import SamplingParams


@dataclass
class NewRequestData:
    """A request entering the runner's persistent batch for the first
    time (or re-entering after preemption with recomputation)."""
    req_id: str
    prompt_token_ids: list[int]
    block_ids: list[int]
    num_computed_tokens: int
    sampling_params: "SamplingParams"
    lora_name: "str | None" = None
    pooling_params: "object | None" = None  # PoolingParams
    mm_data: "object | None" = None  # multimodal inputs (VLM)
    # Encoder cache (core/encoder_cache.py): per-image content hashes,
    # and the subset the runner must encode this step (None => no
    # encoder-cache accounting; runner encodes everything).
    mm_item_hashes: "list[str] | None" = None
    mm_encode_hashes: "list[str] | None" = None


@dataclass
class CachedRequestData:
    """Diff for a request the runner already tracks."""
    req_id: str
    new_block_ids: list[int]
    num_computed_tokens: int
    # Tokens sampled since the runner last saw this request (normally
    # they're already on device from sampling; needed after preemption
    # bookkeeping or spec-decode rollback).
    new_token_ids: list[int] = field(default_factory=list)


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: list[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: list[CachedRequestData] = field(
        default_factory=list)
    # req_id -> tokens to run this step (query length).
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    # req_id -> draft token ids verified this step.
    scheduled_spec_decode_tokens: dict[str, list[int]] = field(
        default_factory=dict)
    # Requests that finished/aborted since the last step: the runner
    # purges their rows.
    finished_req_ids: set[str] = field(default_factory=set)
    preempted_req_ids: set[str] = field(default_factory=set)
    # >1 => device-side multi-step decode of this many iterations
    # (every scheduled request is a 1-token decode; the runner feeds
    # sampled tokens back on device and returns horizon tokens per
    # request).
    decode_horizon: int = 1
    # KV offload tier (core/kv_offload.py): blocks to copy device->host
    # before this step's forward overwrites them [(block_id, hash)],
    # and host-tier hits to upload host->device [(hash, block_id)].
    offload_blocks: list[tuple[int, bytes]] = field(default_factory=list)
    swap_in_blocks: list[tuple[bytes, int]] = field(default_factory=list)
    # Disagg P/D: new requests whose KV payload the runner must inject
    # into their allocated blocks before the forward.
    kv_inject_reqs: list[str] = field(default_factory=list)
    # Encoder cache: embedding-store entries (by image hash) the runner
    # must drop (evicted by the scheduler's encoder budget).
    encoder_evict: list[str] = field(default_factory=list)

    @property
    def num_reqs(self) -> int:
        return len(self.num_scheduled_tokens)


@dataclass
class ModelRunnerOutput:
    """What execution produced, host-side."""
    # order matches the runner's row order for scheduled requests
    req_ids: list[str] = field(default_factory=list)
    # per request: >=1 sampled ids (>1 when spec-decode accepted drafts)
    sampled_token_ids: list[list[int]] = field(default_factory=list)
    # per request: draft tokens proposed for the *next* step
    spec_token_ids: Optional[list[list[int]]] = None
    # per request, per sampled token: (logprob, token_rank) of sampled
    # token plus topk — populated only when requested.
    logprobs: Optional[list[list[dict[int, float]]]] = None
    # per request: pooled embedding (pooling requests whose prefill
    # completed this step; None rows otherwise).
    pooler_outputs: Optional[list[Optional[list[float]]]] = None
    # per request: prompt logprobs (list aligned to prompt positions,
    # entry 0 None), delivered once when its prefill completes.
    prompt_logprobs: Optional[list] = None


@dataclass
class EngineCoreOutput:
    """Per-request step result handed to the frontend/output processor.

    Ref analog: vllm/v1/engine/__init__.py ``EngineCoreOutput:186``.
    """
    req_id: str
    new_token_ids: list[int]
    finished: bool = False
    finish_reason: Optional[str] = None
    stop_reason: Optional[int | str] = None
    new_logprobs: Optional[list[dict[int, float]]] = None
    prompt_logprobs: Optional[list] = None
    pooling_output: Optional[list[float]] = None
    # Filled on finish (tracing / per-request KV metrics).
    kv_cached_tokens: int = 0
    scheduled_time: Optional[float] = None
    num_preemptions: int = 0


@dataclass
class SchedulerStats:
    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    kv_cache_usage: float = 0.0
    prefix_cache_queries: int = 0
    prefix_cache_hits: int = 0
    num_preemptions: int = 0
    # Host KV tier (core/kv_offload.py).
    host_kv_blocks: int = 0
    host_kv_swap_ins: int = 0
    host_kv_stores: int = 0
