"""Scheduler-side request record.

Ref analog: vllm/v1/request.py (``Request:59``, ``RequestStatus:351``).
Holds token ids and scheduling progress; no tensors.
"""

from __future__ import annotations

import enum
import time
from typing import TYPE_CHECKING, Optional

if TYPE_CHECKING:
    from vllm_tpu.sample.params import SamplingParams


class RequestStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    PREEMPTED = 2
    # Everything >= FINISHED_STOPPED is terminal.
    FINISHED_STOPPED = 3
    FINISHED_LENGTH_CAPPED = 4
    FINISHED_ABORTED = 5

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status >= RequestStatus.FINISHED_STOPPED


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
}


class Request:

    def __init__(
        self,
        request_id: str,
        prompt_token_ids: list[int],
        sampling_params: "SamplingParams",
        arrival_time: Optional[float] = None,
        priority: int = 0,
        lora_name: Optional[str] = None,
        pooling_params=None,  # PoolingParams => embedding request
        mm_data=None,  # {"image": np [N,3,H,W]} (prompt pre-expanded)
        mm_hash: Optional[str] = None,
        mm_item_hashes: Optional[list[str]] = None,  # per-image hash
        mm_item_tokens: Optional[list[int]] = None,  # per-image tokens
    ) -> None:
        self.request_id = request_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.sampling_params = sampling_params
        self.arrival_time = (time.monotonic()
                             if arrival_time is None else arrival_time)
        self.priority = priority
        self.lora_name = lora_name
        self.pooling_params = pooling_params
        self.mm_data = mm_data
        self.mm_hash = mm_hash
        self.mm_item_hashes = mm_item_hashes
        self.mm_item_tokens = mm_item_tokens

        self.status = RequestStatus.WAITING
        self.stop_reason: Optional[int | str] = None
        self.output_token_ids: list[int] = []
        # All token ids (prompt + output); single growing list so block
        # hashing and slot computation index one sequence.
        self._all_token_ids: list[int] = list(prompt_token_ids)
        # Tokens whose KV is already computed on-device (includes
        # prefix-cache hits). Never counts the final token of a step
        # until update_from_output confirms it.
        self.num_computed_tokens = 0
        # Speculative draft tokens proposed for the next step.
        self.spec_token_ids: list[int] = []
        # Async scheduling (ref: async_scheduler.py
        # num_output_placeholders): tokens scheduled by in-flight steps
        # whose update_from_output hasn't run yet, and how many output
        # tokens those steps will emit. Both zero in sync mode.
        self.num_async_scheduled = 0
        self.num_async_emits = 0
        # Bookkeeping for preemption: on preempt we reset
        # num_computed_tokens to 0 but keep outputs.
        self.num_preemptions = 0

    # -- token views -------------------------------------------------
    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self._all_token_ids)

    @property
    def num_tokens_with_spec(self) -> int:
        return len(self._all_token_ids) + len(self.spec_token_ids)

    @property
    def all_token_ids(self) -> list[int]:
        return self._all_token_ids

    def append_output_token_ids(self, token_ids: list[int]) -> None:
        self.output_token_ids.extend(token_ids)
        self._all_token_ids.extend(token_ids)

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    @property
    def max_tokens(self) -> int:
        return self.sampling_params.max_tokens

    def get_finished_reason(self) -> Optional[str]:
        return FINISH_REASON.get(self.status)

    def __repr__(self) -> str:
        return (f"Request(id={self.request_id}, status={self.status.name}, "
                f"prompt={self.num_prompt_tokens}, "
                f"out={self.num_output_tokens}, "
                f"computed={self.num_computed_tokens})")
