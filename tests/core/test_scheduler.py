"""Scheduler behavior tests — no model, no device.

Drives schedule()/update_from_output() with fabricated runner outputs
(ref analog: tests/v1/core/test_scheduler.py, 93 tests in the
reference; we cover the same behavior classes).
"""

from tests.core.utils import (create_requests, create_scheduler,
                              mock_runner_output)
from vllm_tpu.core.request import RequestStatus
from vllm_tpu.core.sched_output import ModelRunnerOutput


def step(scheduler, token_id=0):
    out = scheduler.schedule()
    if out.total_num_scheduled_tokens == 0:
        return out, []
    eco = scheduler.update_from_output(out, mock_runner_output(out, token_id))
    return out, eco


class TestBasicScheduling:

    def test_single_prompt_schedules_fully(self):
        s = create_scheduler()
        (req,) = create_requests(1, num_tokens=100)
        s.add_request(req)
        out = s.schedule()
        assert out.num_scheduled_tokens[req.request_id] == 100
        assert len(out.scheduled_new_reqs) == 1
        assert out.scheduled_new_reqs[0].prompt_token_ids == \
            req.prompt_token_ids

    def test_decode_schedules_one_token(self):
        s = create_scheduler()
        (req,) = create_requests(1, num_tokens=10)
        s.add_request(req)
        step(s)
        assert req.num_output_tokens == 1
        out2 = s.schedule()
        assert out2.num_scheduled_tokens[req.request_id] == 1
        assert not out2.scheduled_new_reqs
        assert out2.scheduled_cached_reqs[0].req_id == req.request_id

    def test_many_requests_batched_together(self):
        s = create_scheduler(max_num_seqs=8)
        reqs = create_requests(12, num_tokens=10)
        for r in reqs:
            s.add_request(r)
        out = s.schedule()
        # max_num_seqs caps concurrency
        assert len(out.scheduled_new_reqs) == 8
        assert out.total_num_scheduled_tokens == 80

    def test_token_budget_caps_batch(self):
        s = create_scheduler(max_num_batched_tokens=64,
                             max_num_seqs=16)
        reqs = create_requests(4, num_tokens=50)
        for r in reqs:
            s.add_request(r)
        out = s.schedule()
        assert out.total_num_scheduled_tokens == 64
        # First request got its full 50, second got the remaining 14
        # (chunked prefill).
        assert out.num_scheduled_tokens[reqs[0].request_id] == 50
        assert out.num_scheduled_tokens[reqs[1].request_id] == 14


class TestChunkedPrefill:

    def test_long_prompt_chunks_across_steps(self):
        s = create_scheduler(max_num_batched_tokens=100)
        (req,) = create_requests(1, num_tokens=250)
        s.add_request(req)
        out1, _ = step(s)
        assert out1.num_scheduled_tokens[req.request_id] == 100
        assert req.num_computed_tokens == 100
        out2, _ = step(s)
        assert out2.num_scheduled_tokens[req.request_id] == 100
        out3, eco = step(s)
        assert out3.num_scheduled_tokens[req.request_id] == 50
        # Final chunk produced the first sampled token.
        assert req.num_output_tokens == 1

    def test_no_chunked_prefill_waits_for_budget(self):
        s = create_scheduler(max_num_batched_tokens=100,
                             enable_chunked_prefill=False)
        reqs = create_requests(2, num_tokens=80)
        for r in reqs:
            s.add_request(r)
        out = s.schedule()
        # Second prompt (80 > remaining 20) must wait entirely.
        assert len(out.scheduled_new_reqs) == 1

    def test_long_prefill_token_threshold(self):
        s = create_scheduler(max_num_batched_tokens=1000,
                             long_prefill_token_threshold=64)
        (req,) = create_requests(1, num_tokens=200)
        s.add_request(req)
        out = s.schedule()
        assert out.num_scheduled_tokens[req.request_id] == 64


class TestStopConditions:

    def test_max_tokens_finishes_request(self):
        s = create_scheduler()
        (req,) = create_requests(1, num_tokens=10, max_tokens=3)
        s.add_request(req)
        step(s)
        step(s)
        _, eco = step(s)
        assert req.status == RequestStatus.FINISHED_LENGTH_CAPPED
        assert eco[-1].finished and eco[-1].finish_reason == "length"
        assert not s.has_unfinished_requests()
        # Blocks freed.
        assert s.kv_cache_manager.block_pool.num_free_blocks == 1000

    def test_stop_token_finishes_request(self):
        s = create_scheduler()
        (req,) = create_requests(1, num_tokens=10, max_tokens=50)
        req.sampling_params.stop_token_ids = [777]
        s.add_request(req)
        step(s, token_id=5)
        _, eco = step(s, token_id=777)
        assert req.status == RequestStatus.FINISHED_STOPPED
        assert eco[-1].stop_reason == 777

    def test_abort(self):
        s = create_scheduler()
        reqs = create_requests(2, num_tokens=10)
        for r in reqs:
            s.add_request(r)
        step(s)
        s.finish_requests([reqs[0].request_id],
                          RequestStatus.FINISHED_ABORTED)
        out = s.schedule()
        assert reqs[0].request_id in out.finished_req_ids
        assert reqs[0].request_id not in out.num_scheduled_tokens
        assert reqs[1].request_id in out.num_scheduled_tokens


class TestPreemption:

    def test_preempt_then_resume(self):
        # 9 usable blocks, block_size 16. Two requests of 64 tokens
        # (4 blocks each) fit; as they decode past block boundaries
        # the pool runs out and the newer request must be preempted.
        s = create_scheduler(num_blocks=10, block_size=16,
                             enable_prefix_caching=False,
                             max_num_batched_tokens=512)
        reqs = create_requests(2, num_tokens=63, max_tokens=200)
        for r in reqs:
            s.add_request(r)
        step(s)
        preempted = False
        for _ in range(40):
            out, _ = step(s)
            if out.preempted_req_ids:
                preempted = True
                break
        assert preempted
        assert s.num_preemptions >= 1
        victim = s.requests[next(iter(out.preempted_req_ids))]
        assert victim.status in (RequestStatus.PREEMPTED,
                                 RequestStatus.RUNNING)
        assert victim.num_computed_tokens == 0 or \
            victim.status == RequestStatus.RUNNING

    def test_preempted_request_recomputes_and_finishes(self):
        s = create_scheduler(num_blocks=10, block_size=16,
                             enable_prefix_caching=False,
                             max_num_batched_tokens=512)
        reqs = create_requests(2, num_tokens=63, max_tokens=40)
        for r in reqs:
            s.add_request(r)
        for _ in range(200):
            if not s.has_unfinished_requests():
                break
            step(s)
        assert not s.has_unfinished_requests()
        for r in reqs:
            assert r.num_output_tokens == 40
        assert s.kv_cache_manager.block_pool.num_free_blocks == 9


class TestPrefixCachingIntegration:

    def test_second_identical_prompt_skips_prefill(self):
        s = create_scheduler(block_size=16)
        r1, r2 = create_requests(2, num_tokens=64, same_prompt=True)
        s.add_request(r1)
        step(s)  # r1 prefill (64 tokens)
        s.add_request(r2)
        out = s.schedule()
        # r2 hits 3 full blocks (48 tokens; 4th block capped by the
        # last-token rule) -> schedules only 16.
        assert out.num_scheduled_tokens[r2.request_id] == 16
        new_req = [n for n in out.scheduled_new_reqs
                   if n.req_id == r2.request_id][0]
        assert new_req.num_computed_tokens == 48


class TestSpecDecodeAccounting:

    def test_spec_tokens_verified_and_accepted(self):
        s = create_scheduler()
        (req,) = create_requests(1, num_tokens=10, max_tokens=20)
        s.add_request(req)
        step(s, token_id=1)  # prefill -> 1 output token
        # Propose 2 draft tokens.
        req.spec_token_ids = [50, 51]
        out = s.schedule()
        # Scheduled = 1 (real) + 2 (spec).
        assert out.num_scheduled_tokens[req.request_id] == 3
        assert out.scheduled_spec_decode_tokens[req.request_id] == [50, 51]
        # Runner accepted 1 draft + bonus: 2 sampled tokens.
        mro = ModelRunnerOutput(req_ids=[req.request_id],
                                sampled_token_ids=[[50, 99]])
        eco = s.update_from_output(out, mro)
        assert req.output_token_ids[-2:] == [50, 99]
        # computed advances by 3 - (2-1 rejected) = 2
        assert req.num_computed_tokens == 12
        assert eco[0].new_token_ids == [50, 99]


class TestFairness:

    def test_fcfs_admission_order(self):
        s = create_scheduler(max_num_seqs=1)
        reqs = create_requests(3, num_tokens=5, max_tokens=2)
        for r in reqs:
            s.add_request(r)
        served = []
        for _ in range(20):
            out, eco = step(s)
            for e in eco:
                if e.finished:
                    served.append(e.req_id)
            if not s.has_unfinished_requests():
                break
        assert served == ["req-0", "req-1", "req-2"]


class TestPriorityPolicy:

    def test_priority_admission_order(self):
        from tests.core.utils import create_scheduler
        from vllm_tpu.core.request import Request
        from vllm_tpu.sample.params import SamplingParams
        s = create_scheduler(max_num_seqs=1, policy="priority")
        for i, prio in enumerate([5, 1, 3]):
            s.add_request(
                Request(f"p{i}", [i, i + 1, i + 2],
                        SamplingParams(max_tokens=2), priority=prio))
        served = []
        for _ in range(20):
            out, eco = step(s)
            for e in eco:
                if e.finished:
                    served.append(e.req_id)
            if not s.has_unfinished_requests():
                break
        # priority 1 (p1) first, then 3 (p2), then 5 (p0)
        assert served == ["p1", "p2", "p0"]


class TestWaitingQueue:

    def _reqs(self, specs):
        from vllm_tpu.core.request import Request
        from vllm_tpu.sample.params import SamplingParams
        return [
            Request(f"r{i}", [1, 2, 3], SamplingParams(max_tokens=2),
                    priority=p, arrival_time=float(i))
            for i, p in enumerate(specs)
        ]

    def test_priority_heap_order_and_lazy_removal(self):
        from vllm_tpu.core.scheduler import WaitingQueue
        q = WaitingQueue(priority=True)
        reqs = self._reqs([5, 1, 3, 1])
        for r in reqs:
            q.push(r)
        assert len(q) == 4
        q.remove(reqs[1])  # lazy: O(1)
        assert len(q) == 3
        # same priority ties break by arrival: r3 (prio 1) first.
        assert q.pop().request_id == "r3"
        assert q.pop().request_id == "r2"
        assert q.peek().request_id == "r0"
        assert list(q) == [reqs[0]]

    def test_fcfs_order_and_push_front(self):
        from vllm_tpu.core.scheduler import WaitingQueue
        q = WaitingQueue(priority=False)
        reqs = self._reqs([0, 0, 0])
        for r in reqs:
            q.push(r)
        q.push_front(reqs[2])  # preemption resume
        assert q.pop() is reqs[2]
        assert q.pop() is reqs[0]
        assert len(q) == 2  # reqs[1] + the duplicate reqs[2]
