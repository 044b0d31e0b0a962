"""Fixed-row persistent batch (host side).

Model Runner V2's fixed-row design is exactly the XLA-friendly layout
(SURVEY.md §7 design translation): every resident request owns a stable
row index in [0, max_num_reqs); per-step device arrays are built by
writing into preallocated numpy buffers and uploading. No dynamic
shapes ever reach jit.

Ref analog: vllm/v1/worker/gpu/input_batch.py (fixed-row persistent
state + gather) and gpu_input_batch.py CachedRequestState:35.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from vllm_tpu.sample.params import SamplingParams


@dataclass
class CachedReqState:
    """Host mirror of one resident request."""
    req_id: str
    row: int
    token_ids: list[int]
    num_computed_tokens: int
    block_ids: list[int]
    sampling_params: SamplingParams
    # length of the prompt at admission (output tokens follow; used by
    # the penalty bin-counts to split prompt vs output)
    prompt_len: int = 0
    # device-side Gumbel stream position (see SamplingMetadata.steps)
    sample_step: int = 0
    # structured-output decoding state (structured_output/trie.py)
    grammar: object = None
    # LoRA adapter slot (0 = none; see lora/ LoRARegistry)
    lora_slot: int = 0


class InputBatch:
    """Row allocator + persistent per-row arrays."""

    def __init__(self, max_num_reqs: int, max_blocks_per_req: int,
                 engine_seed: int = 0) -> None:
        self.max_num_reqs = max_num_reqs
        self.max_blocks_per_req = max_blocks_per_req
        self.engine_seed = engine_seed
        # Bumped on any sampling-relevant mutation; the runner caches
        # device-resident copies of the per-row sampling arrays keyed
        # on this (multi-step launches through the remote tunnel paid
        # ~10 small H2D round trips each without it).
        self.version = 0
        self.reqs: dict[str, CachedReqState] = {}
        self._free_rows = list(range(max_num_reqs - 1, -1, -1))
        self.row_to_req: list[Optional[CachedReqState]] = \
            [None] * max_num_reqs

        # Persistent numpy mirrors uploaded each step.
        self.block_tables = np.zeros((max_num_reqs, max_blocks_per_req),
                                     np.int32)
        self.temperature = np.zeros((max_num_reqs, ), np.float32)
        self.top_k = np.zeros((max_num_reqs, ), np.int32)
        self.top_p = np.ones((max_num_reqs, ), np.float32)
        self.min_p = np.zeros((max_num_reqs, ), np.float32)
        self.seeds = np.zeros((max_num_reqs, ), np.int32)
        self.sample_steps = np.zeros((max_num_reqs, ), np.int32)
        self.lora_slots = np.zeros((max_num_reqs, ), np.int32)
        # mrope (Qwen2-VL): decode rope position = position + delta
        # (ref analog: mrope_position_delta, HF get_rope_index).
        self.mrope_delta = np.zeros((max_num_reqs, ), np.int32)

    @property
    def num_reqs(self) -> int:
        return len(self.reqs)

    def add_request(
        self,
        req_id: str,
        token_ids: list[int],
        block_ids: list[int],
        num_computed_tokens: int,
        sampling_params: SamplingParams,
        lora_slot: int = 0,
    ) -> CachedReqState:
        assert req_id not in self.reqs, f"{req_id} already resident"
        assert self._free_rows, "batch full"
        row = self._free_rows.pop()
        state = CachedReqState(req_id, row, list(token_ids),
                               num_computed_tokens, list(block_ids),
                               sampling_params, prompt_len=len(token_ids),
                               lora_slot=lora_slot)
        self.lora_slots[row] = lora_slot
        self.reqs[req_id] = state
        self.row_to_req[row] = state

        self.block_tables[row, :] = 0
        self.block_tables[row, :len(block_ids)] = block_ids
        sp = sampling_params
        self.temperature[row] = sp.temperature
        self.top_k[row] = sp.top_k
        self.top_p[row] = sp.top_p
        self.min_p[row] = sp.min_p
        # Stable per-request stream: user seed, else engine seed ^ row
        # salt (row reuse across requests also bumps sample_step? No —
        # new request resets step 0 with a fresh seed derivation; we
        # fold the python hash of req_id for uniqueness).
        if sp.seed is not None:
            self.seeds[row] = np.int32(sp.seed & 0x7FFFFFFF)
        else:
            self.seeds[row] = np.int32(
                (self.engine_seed ^ hash(req_id)) & 0x7FFFFFFF)
        self.sample_steps[row] = 0
        self.mrope_delta[row] = 0
        self.version += 1
        return state

    def remove_request(self, req_id: str) -> None:
        state = self.reqs.pop(req_id, None)
        if state is None:
            return
        self.row_to_req[state.row] = None
        self.lora_slots[state.row] = 0
        self.mrope_delta[state.row] = 0
        self._free_rows.append(state.row)
        self.version += 1

    def append_block_ids(self, req_id: str,
                         new_block_ids: list[int]) -> None:
        state = self.reqs[req_id]
        start = len(state.block_ids)
        state.block_ids.extend(new_block_ids)
        self.block_tables[state.row,
                          start:len(state.block_ids)] = new_block_ids

    def bump_sample_step(self, req_id: str) -> None:
        state = self.reqs[req_id]
        state.sample_step += 1
        self.sample_steps[state.row] = state.sample_step
        self.version += 1
