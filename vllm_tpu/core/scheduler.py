"""Continuous-batching scheduler: one token-budget loop.

Behavioral parity with the reference scheduler (ref:
vllm/v1/core/sched/scheduler.py ``Scheduler:69``, ``schedule():440``,
``update_from_output():1679``): there are no prefill/decode phases —
each step hands every scheduled request a token budget slice
(``num_computed_tokens .. num_computed_tokens + num_new_tokens``), which
uniformly expresses chunked prefill, decode, and speculative
verification (design note ref: scheduler.py:442-451).

Device-free: the scheduler sees token counts and block ids only.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Iterable, Optional

from vllm_tpu.config import EngineConfig
from vllm_tpu.core.kv_cache_manager import KVCacheManager
from vllm_tpu.core.request import Request, RequestStatus
from vllm_tpu.core.sched_output import (CachedRequestData, EngineCoreOutput,
                                        ModelRunnerOutput, NewRequestData,
                                        SchedulerOutput, SchedulerStats)
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


class WaitingQueue:
    """Admission queue. FCFS: deque. Priority: min-heap keyed
    (priority, arrival) with lazy removal — O(log n) admission instead
    of the O(n) insertion scan (ref: vllm request_queue.py:208
    priority heap; matters in the thousands-waiting regime)."""

    def __init__(self, priority: bool) -> None:
        import heapq
        self._priority = priority
        self._heapq = heapq
        self._dq: deque[Request] = deque()
        self._heap: list[tuple[int, float, int, Request]] = []
        self._removed: set[str] = set()
        self._seq = 0
        self._n = 0

    def push(self, request: Request) -> None:
        if self._priority:
            self._seq += 1
            self._heapq.heappush(
                self._heap,
                (request.priority, request.arrival_time, self._seq,
                 request))
        else:
            self._dq.append(request)
        self._n += 1

    def push_front(self, request: Request) -> None:
        """Preemption resume: FCFS returns to the head; priority mode
        re-inserts by key (the heap order is the policy)."""
        if self._priority:
            self.push(request)
            self._n -= 1  # push() counted it
        else:
            self._dq.appendleft(request)
        self._n += 1

    def _gc(self) -> None:
        while (self._heap
               and self._heap[0][3].request_id in self._removed):
            _, _, _, r = self._heapq.heappop(self._heap)
            self._removed.discard(r.request_id)

    def peek(self) -> Request:
        if self._priority:
            self._gc()
            return self._heap[0][3]
        return self._dq[0]

    def pop(self) -> Request:
        self._n -= 1
        if self._priority:
            self._gc()
            return self._heapq.heappop(self._heap)[3]
        return self._dq.popleft()

    def remove(self, request: Request) -> None:
        """Lazy O(1) removal (priority); O(n) scan only on FCFS."""
        if self._priority:
            self._removed.add(request.request_id)
        else:
            self._dq.remove(request)
        self._n -= 1

    def __len__(self) -> int:
        return self._n

    def __bool__(self) -> bool:
        return self._n > 0

    def __iter__(self):
        if self._priority:
            return (r for _, _, _, r in sorted(self._heap)
                    if r.request_id not in self._removed)
        return iter(self._dq)


class Scheduler:

    def __init__(self, config: EngineConfig, num_blocks: int) -> None:
        self.config = config
        self.max_num_seqs = config.scheduler.max_num_seqs
        self.max_num_batched_tokens = config.scheduler.max_num_batched_tokens
        self.long_prefill_token_threshold = (
            config.scheduler.long_prefill_token_threshold)
        self.enable_chunked_prefill = config.scheduler.enable_chunked_prefill
        self.max_model_len = config.model.max_model_len
        self.block_size = config.cache.block_size

        self.kv_cache_manager = KVCacheManager(
            num_blocks=num_blocks,
            block_size=config.cache.block_size,
            enable_caching=config.cache.enable_prefix_caching,
            hash_algo=config.cache.prefix_caching_hash_algo,
            sliding_window=config.model.sliding_window,
            cp=config.parallel.context_parallel_size,
        )

        # EAGLE's chained draft steps write draft-KV up to k positions
        # past the last accepted token; reserve block headroom (ref
        # analog: num_lookahead_tokens in the reference scheduler).
        sc = config.speculative
        self.num_lookahead_tokens = (
            sc.num_speculative_tokens + 1
            if sc.method in ("eagle", "eagle3", "mtp", "draft_model")
            else 0)

        # Overlap scheduling (ref: async_scheduler.py): schedule step
        # N+1 before step N's outputs apply, booking one output
        # placeholder per emitting request. Spec decode needs host
        # verification between steps, so the two are exclusive.
        self.async_scheduling = config.scheduler.async_scheduling
        if self.async_scheduling and sc.method is not None:
            raise ValueError(
                "async_scheduling is incompatible with speculative "
                "decoding (drafts need host verification per step)")

        # Encoder cache (core/encoder_cache.py; ref analog:
        # encoder_cache_manager.py): vision embeddings cached by image
        # hash under a token budget; shared images encode once.
        from vllm_tpu.core.encoder_cache import EncoderCacheManager
        self.encoder_cache = EncoderCacheManager(
            config.scheduler.encoder_cache_budget)

        # Host KV tier (core/kv_offload.py): evicted cached blocks are
        # copied to CPU RAM and re-admitted on content-hash hits.
        self.host_kv_pool = None
        self._pending_offload: list[tuple[int, bytes]] = []
        self.num_swap_ins = 0
        if (config.cache.host_swap_bytes > 0
                and config.cache.enable_prefix_caching
                and not config.model.mamba_num_heads
                and config.model.gdn is None
                and config.parallel.pipeline_parallel_size == 1
                and config.parallel.context_parallel_size == 1):
            from vllm_tpu.core.kv_offload import (FileKVTier, HostKVPool,
                                                  ObjectKVTier,
                                                  TieredHostKVPool)
            if config.cache.kv_object_store_addr:
                self.host_kv_pool = TieredHostKVPool(
                    config.cache.host_swap_bytes,
                    ObjectKVTier(config.cache.kv_object_store_addr))
            elif config.cache.offload_dir:
                self.host_kv_pool = TieredHostKVPool(
                    config.cache.host_swap_bytes,
                    FileKVTier(config.cache.offload_dir,
                               config.cache.offload_dir_bytes))
            else:
                self.host_kv_pool = HostKVPool(
                    config.cache.host_swap_bytes)
            self.kv_cache_manager.block_pool.on_evict = (
                lambda bid, h: self._pending_offload.append((bid, h)))

        self.requests: dict[str, Request] = {}
        self.waiting = WaitingQueue(
            config.scheduler.policy == "priority")
        self.running: list[Request] = []
        # Finished/aborted between steps; the runner purges these rows.
        self.finished_req_ids: set[str] = set()
        self.num_preemptions = 0

    # -- request lifecycle -------------------------------------------
    def add_request(self, request: Request) -> None:
        if request.num_prompt_tokens >= self.max_model_len:
            raise ValueError(
                f"prompt ({request.num_prompt_tokens} tokens) >= "
                f"max_model_len ({self.max_model_len})")
        self.requests[request.request_id] = request
        self.waiting.push(request)

    def finish_requests(self, request_ids: Iterable[str],
                        status: RequestStatus) -> None:
        """External finish (abort / stop-string hit in the detokenizer)."""
        for req_id in request_ids:
            request = self.requests.get(req_id)
            if request is None or request.is_finished:
                continue
            if request.status == RequestStatus.RUNNING:
                self.running.remove(request)
            else:
                try:
                    self.waiting.remove(request)
                except ValueError:
                    pass
            request.status = status
            self._free_request(request)

    def _free_request(self, request: Request) -> None:
        self.kv_cache_manager.free(request)
        self.kv_cache_manager.free_block_hashes(request)
        self.encoder_cache.free_request(request.request_id)
        self.finished_req_ids.add(request.request_id)
        del self.requests[request.request_id]

    # -- scheduling ---------------------------------------------------
    def schedule(self) -> SchedulerOutput:
        out = SchedulerOutput()
        out.finished_req_ids = self.finished_req_ids
        self.finished_req_ids = set()

        token_budget = self.max_num_batched_tokens
        preempted_this_step: set[str] = set()

        # Phase 1: running requests (decode / ongoing chunked prefill /
        # spec verification). Iterate a copy: preemption mutates the list.
        req_index = 0
        while req_index < len(self.running) and token_budget > 0:
            request = self.running[req_index]
            # Async mode: the base advances past in-flight scheduled
            # tokens, and each in-flight emit adds one not-yet-known
            # token (the runner feeds it from the previous step's
            # on-device samples). Sync mode: both counters are 0.
            base_computed = (request.num_computed_tokens +
                             request.num_async_scheduled)
            num_new_tokens = (request.num_tokens_with_spec +
                              request.num_async_emits - base_computed)
            if (self.long_prefill_token_threshold > 0
                    and num_new_tokens > self.long_prefill_token_threshold):
                num_new_tokens = self.long_prefill_token_threshold
            num_new_tokens = min(num_new_tokens, token_budget)
            # Clamp to model length (leave room for sampled token slot).
            num_new_tokens = min(num_new_tokens,
                                 self.max_model_len - base_computed)
            if num_new_tokens <= 0:
                req_index += 1
                continue

            # Spec tokens actually scheduled this step.
            num_spec_scheduled = max(
                0, request.num_computed_tokens + num_new_tokens -
                request.num_tokens)

            # Allocate, preempting not-yet-scheduled requests if needed.
            # Victims always come from self.running[req_index:]: requests
            # already scheduled this step must not be rolled back.
            # allocate_slots sizes from request.num_computed_tokens, so
            # in-flight scheduled tokens inflate the demand (their
            # blocks are already owned; the cdiv math needs them).
            while True:
                new_blocks = self.kv_cache_manager.allocate_slots(
                    request,
                    num_new_tokens + request.num_async_scheduled,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is not None:
                    break
                victim = self._find_preemption_victim(req_index)
                self._preempt(victim, preempted_this_step)
                if victim is request:
                    break
            if new_blocks is None:
                # request itself was preempted; running[req_index] is now
                # the next request.
                continue

            out.scheduled_cached_reqs.append(
                CachedRequestData(
                    req_id=request.request_id,
                    new_block_ids=new_blocks.get_block_ids(),
                    num_computed_tokens=base_computed,
                    # Positions past num_tokens are in-flight outputs:
                    # the slice comes up short and the runner installs
                    # -1 placeholders fed from device-side samples.
                    new_token_ids=request.all_token_ids[
                        base_computed:base_computed + num_new_tokens],
                ))
            out.num_scheduled_tokens[request.request_id] = num_new_tokens
            token_budget -= num_new_tokens
            if num_spec_scheduled > 0:
                out.scheduled_spec_decode_tokens[request.request_id] = (
                    request.spec_token_ids[:num_spec_scheduled])
            if self.async_scheduling:
                request.num_async_scheduled += num_new_tokens
                if (base_computed + num_new_tokens ==
                        request.num_tokens + request.num_async_emits):
                    request.num_async_emits += 1
            req_index += 1

        # Phase 2: waiting queue (new + resumed requests). Skipped if we
        # preempted: admitting while evicting would thrash.
        if not preempted_this_step:
            while (self.waiting and token_budget > 0
                   and len(self.running) < self.max_num_seqs):
                request = self.waiting.peek()
                resumed = request.status == RequestStatus.PREEMPTED

                # Disagg P/D: a transferred-KV request skips prefill of
                # the payload region (blocks allocated below; the
                # runner injects the bytes pre-forward).
                inject = False
                remote = getattr(request, "remote_kv", None)
                if remote is not None and request.num_computed_tokens == 0:
                    request.num_computed_tokens = min(
                        remote.num_tokens, request.num_tokens - 1)
                    inject = request.num_computed_tokens > 0

                # Prefix-cache lookup (fresh requests only). Pooling
                # requests skip it: cache-hit tokens would be absent
                # from the pooled hidden-state stream.
                if request.pooling_params is None:
                    new_computed_blocks, num_cached_tokens = (
                        self.kv_cache_manager.get_computed_blocks(request))
                else:
                    from vllm_tpu.core.kv_cache_manager import \
                        KVCacheBlocks
                    new_computed_blocks, num_cached_tokens = (
                        KVCacheBlocks([]), 0)

                # Host-tier lookup: consecutive block hashes beyond the
                # device hit that live in the CPU pool get device
                # blocks allocated and swap in pre-forward.
                host_hits = 0
                if (self.host_kv_pool is not None and remote is None
                        and request.pooling_params is None
                        and request.num_computed_tokens == 0):
                    hashes = self.kv_cache_manager.req_to_block_hashes.get(
                        request.request_id, [])
                    start_blk = num_cached_tokens // self.block_size
                    i = start_blk
                    max_tok = request.num_tokens - 1
                    while ((i + 1) * self.block_size <= max_tok
                           and i < len(hashes)
                           and hashes[i] in self.host_kv_pool):
                        i += 1
                    host_hits = i - start_blk
                    num_cached_tokens += host_hits * self.block_size

                num_new_tokens = request.num_tokens - max(
                    request.num_computed_tokens, num_cached_tokens)
                if (self.long_prefill_token_threshold > 0 and num_new_tokens
                        > self.long_prefill_token_threshold):
                    num_new_tokens = self.long_prefill_token_threshold
                if num_new_tokens > token_budget:
                    if not self.enable_chunked_prefill:
                        break  # entire prompt must fit the budget
                    num_new_tokens = token_budget
                assert num_new_tokens > 0

                # Encoder budget (ref: scheduler-side encoder_budget,
                # encoder_cache_manager.py): reserve embedding-cache
                # space for the request's images; cache hits skip the
                # vision tower entirely. Over budget => keep waiting.
                if (request.mm_item_hashes
                        and not self.encoder_cache.has_request(
                            request.request_id)):
                    enc_alloc = self.encoder_cache.try_allocate(
                        request.request_id, request.mm_item_hashes,
                        request.mm_item_tokens)
                    if enc_alloc is None:
                        break  # encoder budget exhausted
                    # Evictions apply even if block allocation below
                    # defers the request to a later step.
                    out.encoder_evict.extend(enc_alloc.evict_hashes)
                    request._enc_miss = enc_alloc.miss_hashes

                # Swap-in regions need device blocks but no compute:
                # inflate the allocation, not the token budget.
                alloc_tokens = num_new_tokens + host_hits * self.block_size
                new_blocks = self.kv_cache_manager.allocate_slots(
                    request, alloc_tokens, new_computed_blocks,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is None:
                    break  # no space; keep waiting

                if host_hits:
                    blks = self.kv_cache_manager.req_to_blocks[
                        request.request_id]
                    first = num_cached_tokens // self.block_size - host_hits
                    for j in range(host_hits):
                        out.swap_in_blocks.append(
                            (hashes[first + j],
                             blks[first + j].block_id))
                    self.num_swap_ins += host_hits
                if inject:
                    out.kv_inject_reqs.append(request.request_id)

                self.waiting.pop()
                request.status = RequestStatus.RUNNING
                request.num_computed_tokens = max(request.num_computed_tokens,
                                                  num_cached_tokens)
                # Per-request KV-hit + queue-time stats (tracing).
                request.num_cached_tokens = max(
                    getattr(request, "num_cached_tokens", 0),
                    num_cached_tokens)
                if getattr(request, "scheduled_time", None) is None:
                    request.scheduled_time = time.monotonic()
                self.running.append(request)

                enc_miss = getattr(request, "_enc_miss", None)
                request._enc_miss = None
                if resumed:
                    # Runner rebuilt state is included in NewRequestData
                    # with all tokens produced so far.
                    out.scheduled_new_reqs.append(
                        NewRequestData(
                            req_id=request.request_id,
                            prompt_token_ids=list(request.all_token_ids),
                            block_ids=self.kv_cache_manager.get_block_ids(
                                request.request_id),
                            num_computed_tokens=request.num_computed_tokens,
                            sampling_params=request.sampling_params,
                            lora_name=request.lora_name,
                            pooling_params=request.pooling_params,
                            mm_data=request.mm_data,
                            mm_item_hashes=request.mm_item_hashes,
                            mm_encode_hashes=enc_miss or [],
                        ))
                else:
                    out.scheduled_new_reqs.append(
                        NewRequestData(
                            req_id=request.request_id,
                            prompt_token_ids=request.prompt_token_ids,
                            block_ids=self.kv_cache_manager.get_block_ids(
                                request.request_id),
                            num_computed_tokens=request.num_computed_tokens,
                            sampling_params=request.sampling_params,
                            lora_name=request.lora_name,
                            pooling_params=request.pooling_params,
                            mm_data=request.mm_data,
                            mm_item_hashes=request.mm_item_hashes,
                            mm_encode_hashes=enc_miss or [],
                        ))
                out.num_scheduled_tokens[request.request_id] = num_new_tokens
                token_budget -= num_new_tokens
                if self.async_scheduling:
                    request.num_async_scheduled += num_new_tokens
                    if (request.num_computed_tokens + num_new_tokens ==
                            request.num_tokens):
                        request.num_async_emits += 1

        out.total_num_scheduled_tokens = sum(
            out.num_scheduled_tokens.values())
        out.preempted_req_ids = preempted_this_step
        self._maybe_enable_multi_step(out)
        # Drain pending offloads LAST: the lookahead allocation inside
        # _maybe_enable_multi_step can evict cached blocks too, and an
        # eviction must ride THIS step's SchedulerOutput — the runner
        # copies offloaded blocks out before the forward overwrites
        # them; deferring to the next step would save the new owner's
        # bytes under the old content hash.
        if self._pending_offload:
            out.offload_blocks = self._pending_offload
            self._pending_offload = []
        return out

    def _maybe_enable_multi_step(self, out: SchedulerOutput) -> None:
        """Steady-state decode: extend this step to a device-side
        multi-step horizon (see SchedulerConfig.multi_step_decode_horizon).
        Eligible when nothing is waiting, no new/resumed requests, no
        spec drafts, and every scheduled request runs exactly 1 token."""
        horizon = self.config.scheduler.multi_step_decode_horizon
        # EAGLE-family drafters propose from the single-step program's
        # hidden states; multi-step would starve them of drafts forever.
        if self.config.speculative.method in ("eagle", "eagle3", "mtp"):
            return
        if (horizon <= 1 or self.waiting or out.scheduled_new_reqs
                or out.scheduled_spec_decode_tokens
                or not out.num_scheduled_tokens
                or any(n != 1 for n in out.num_scheduled_tokens.values())):
            return
        reqs = [self.requests[r] for r in out.num_scheduled_tokens]
        # Penalties and logprobs need per-token host data: single-step.
        # (In-flight async tokens are fine: the runner's multi-step
        # carry feeds them device-side, and the engine drains before
        # launch when the carry doesn't cover — llm_engine._step_async.)
        for r in reqs:
            sp = r.sampling_params
            if r.pooling_params is not None:
                return
            if (sp.logprobs or sp.guided
                    or sp.has_penalties):
                return
        # Cap so no request can cross max_model_len mid-horizon
        # (num_tokens + in-flight emissions the host hasn't seen yet).
        h = min([horizon] +
                [self.max_model_len - r.num_tokens - r.num_async_emits
                 for r in reqs])
        if h <= 1:
            return
        # Lookahead KV slots for the h-1 future tokens (unverified:
        # never prefix-cached). In the async pipeline the in-flight
        # horizon's slots (num_async_scheduled beyond this step's one
        # token) inflate the demand — allocate_slots sizes from
        # num_computed_tokens, which trails the in-flight writes.
        for request in reqs:
            sched = out.num_scheduled_tokens[request.request_id]
            inflight = max(0, request.num_async_scheduled - sched)
            got = self.kv_cache_manager.allocate_slots(
                request, 1 + inflight, num_lookahead_tokens=h - 1)
            if got is None:
                h = 1
                break
            if got.blocks:
                for cr in out.scheduled_cached_reqs:
                    if cr.req_id == request.request_id:
                        cr.new_block_ids.extend(got.get_block_ids())
        if h > 1:
            out.decode_horizon = h
            if self.async_scheduling:
                # The device consumes/emits h tokens this step, not 1:
                # top up the in-flight counters (phase 1 counted one).
                for r in reqs:
                    r.num_async_scheduled += h - 1
                    r.num_async_emits += h - 1

    def _find_preemption_victim(self, req_index: int) -> Request:
        # FCFS: newest request loses. Priority policy: highest priority
        # value (= lowest urgency), then newest arrival. Only requests
        # not yet scheduled this step are eligible.
        candidates = self.running[req_index:]
        assert candidates, "allocate failed with no preemptable requests"
        if self.config.scheduler.policy == "priority":
            return max(candidates,
                       key=lambda r: (r.priority, r.arrival_time))
        return candidates[-1]

    def preempt_all(self) -> None:
        """Drain the running set: force-preempt every running request
        back to the waiting queue (recompute-on-resume). Used by
        elastic EP rescale (ref analog: the request drain in
        vllm/distributed/elastic_ep/elastic_state.py scale_up/down —
        the reference pauses scheduling and re-queues in-flight work
        before re-forming process groups). Reversed order so FCFS
        arrival order survives the push_front resume path."""
        for request in reversed(list(self.running)):
            self._preempt(request, set())

    def _preempt(self, request: Request,
                 preempted_this_step: set[str]) -> None:
        logger.debug("preempting %s", request.request_id)
        self.running.remove(request)
        self.kv_cache_manager.free(request)
        request.status = RequestStatus.PREEMPTED
        request.num_computed_tokens = 0
        request.spec_token_ids = []
        # In-flight async steps for this request are now void; their
        # late outputs are dropped in update_from_output (status guard).
        request.num_async_scheduled = 0
        request.num_async_emits = 0
        request.num_preemptions += 1
        self.num_preemptions += 1
        preempted_this_step.add(request.request_id)
        # Head of the waiting queue: preempted requests resume first.
        self.waiting.push_front(request)

    # -- post-execution ----------------------------------------------
    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        runner_output: ModelRunnerOutput,
    ) -> list[EngineCoreOutput]:
        outputs: list[EngineCoreOutput] = []
        num_scheduled = scheduler_output.num_scheduled_tokens
        spec_scheduled = scheduler_output.scheduled_spec_decode_tokens

        for i, req_id in enumerate(runner_output.req_ids):
            request = self.requests.get(req_id)
            if request is None:
                continue  # aborted mid-flight
            sched_tokens = num_scheduled.get(req_id)
            if sched_tokens is None:
                continue
            if request.status != RequestStatus.RUNNING:
                continue  # preempted after this step launched (async)
            if self.async_scheduling:
                # Multi-step horizons consumed/emitted len(sampled)
                # tokens on device, not the 1 that phase 1 scheduled.
                n_s = runner_output.sampled_token_ids[i]
                if scheduler_output.decode_horizon > 1 and n_s:
                    consumed = emitted = len(n_s)
                else:
                    consumed = sched_tokens
                    emitted = 1 if n_s else 0
                request.num_async_scheduled = max(
                    0, request.num_async_scheduled - consumed)
                request.num_async_emits = max(
                    0, request.num_async_emits - emitted)

            if request.pooling_params is not None:
                request.num_computed_tokens += sched_tokens
                if (request.num_computed_tokens >=
                        request.num_prompt_tokens):
                    request.status = RequestStatus.FINISHED_STOPPED
                    pooled = (runner_output.pooler_outputs[i]
                              if runner_output.pooler_outputs else None)
                    outputs.append(
                        EngineCoreOutput(req_id=req_id, new_token_ids=[],
                                         finished=True,
                                         finish_reason="stop",
                                         pooling_output=pooled))
                    self.running.remove(request)
                    self._free_request(request)
                continue

            sampled = runner_output.sampled_token_ids[i]
            spec_toks = spec_scheduled.get(req_id, [])
            if scheduler_output.decode_horizon > 1 and sampled:
                # Multi-step decode: len(sampled) inputs were consumed
                # on device (the known token + h-1 fed-back samples).
                request.num_computed_tokens += len(sampled)
            elif spec_toks:
                # Spec verification: sampled includes the bonus token.
                # num_accepted drafts => computed advances by
                # sched_tokens - (num_drafts - num_accepted).
                num_accepted = len(sampled) - 1
                num_rejected = len(spec_toks) - num_accepted
                request.num_computed_tokens += sched_tokens - num_rejected
            else:
                request.num_computed_tokens += sched_tokens
            request.spec_token_ids = []

            new_token_ids: list[int] = []
            finished = False
            if request.num_computed_tokens >= request.num_tokens:
                # The forward covered all existing tokens => `sampled`
                # are genuinely new output tokens.
                sp = request.sampling_params
                if (len(sampled) > 1 and sp.ignore_eos
                        and not sp.stop_token_ids
                        and request.num_output_tokens + len(sampled)
                        < sp.max_tokens
                        and request.num_tokens + len(sampled)
                        < self.max_model_len):
                    # Multi-step fast path: no stop can fire inside
                    # this horizon — one bulk append instead of
                    # per-token bookkeeping (the post-launch host tail
                    # is on the measured decode path).
                    request.append_output_token_ids(sampled)
                    new_token_ids = list(sampled)
                else:
                    for tok in sampled:
                        request.append_output_token_ids([tok])
                        new_token_ids.append(tok)
                        finished = self._check_stop(request, tok)
                        if finished:
                            break

            if runner_output.spec_token_ids is not None and not finished:
                request.spec_token_ids = runner_output.spec_token_ids[i]

            if new_token_ids or finished:
                outputs.append(
                    EngineCoreOutput(
                        req_id=req_id,
                        new_token_ids=new_token_ids,
                        finished=finished,
                        finish_reason=request.get_finished_reason(),
                        stop_reason=request.stop_reason,
                        new_logprobs=(runner_output.logprobs[i]
                                      if runner_output.logprobs else None),
                        prompt_logprobs=(
                            runner_output.prompt_logprobs[i]
                            if runner_output.prompt_logprobs else None),
                        kv_cached_tokens=getattr(request,
                                                 "num_cached_tokens", 0),
                        scheduled_time=getattr(request, "scheduled_time",
                                               None),
                        num_preemptions=request.num_preemptions,
                    ))
            if finished:
                self.running.remove(request)
                self._free_request(request)
        return outputs

    def _check_stop(self, request: Request, last_token: int) -> bool:
        sp = request.sampling_params
        if request.num_output_tokens >= sp.min_tokens:
            if not sp.ignore_eos and last_token in self._eos_ids(request):
                request.status = RequestStatus.FINISHED_STOPPED
                request.stop_reason = last_token
                return True
            if last_token in sp.stop_token_ids:
                request.status = RequestStatus.FINISHED_STOPPED
                request.stop_reason = last_token
                return True
        if request.num_output_tokens >= sp.max_tokens:
            request.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return True
        if request.num_tokens >= self.max_model_len:
            request.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return True
        return False

    def _eos_ids(self, request: Request) -> tuple[int, ...]:
        eos = getattr(request.sampling_params, "_eos_token_ids", None)
        if eos is None:
            eos = getattr(self.config.model, "eos_token_ids", None) or ()
        return tuple(eos) if eos else ()

    # -- introspection -----------------------------------------------
    def has_unfinished_requests(self) -> bool:
        return bool(self.running or self.waiting)

    def get_num_unfinished_requests(self) -> int:
        return len(self.running) + len(self.waiting)

    def make_stats(self) -> SchedulerStats:
        st = self.kv_cache_manager.block_pool.stats
        pool = self.host_kv_pool
        return SchedulerStats(
            num_running_reqs=len(self.running),
            num_waiting_reqs=len(self.waiting),
            kv_cache_usage=self.kv_cache_manager.usage,
            prefix_cache_queries=st.queries,
            prefix_cache_hits=st.hits,
            num_preemptions=self.num_preemptions,
            host_kv_blocks=pool.num_blocks if pool else 0,
            host_kv_swap_ins=self.num_swap_ins,
            host_kv_stores=pool.stores if pool else 0,
        )
