"""Engine-level DP: coordinator wave state, load-balanced routing,
lockstep dummy steps.

Ref analog: the reference's DP control plane tests
(tests/v1/distributed/test_*_lb_dp.py drive several engines behind a
load-balancing client; coordinator.py wave semantics).
"""

import threading
import time
import uuid

import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.dp import (DPCoordinator, DPEngineCoreProc,
                                DPLBClient)
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def tiny_cfg():
    mc = ModelConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=128, num_layers=2, num_heads=4,
                     num_kv_heads=2, max_model_len=64, dtype="float32")
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
    )
    mc.eos_token_ids = []  # type: ignore[attr-defined]
    return cfg


def addrs(tag: str, n: int):
    base = f"ipc:///tmp/vtdp-{tag}-{uuid.uuid4().hex[:8]}"
    report, publish = f"{base}-rep", f"{base}-pub"
    engines = [(f"{base}-in{i}", f"{base}-out{i}") for i in range(n)]
    return report, publish, engines


@pytest.mark.parametrize("lockstep", [False, True])
def test_dp_two_ranks_e2e(cpu_devices, lockstep):
    n = 2
    report, publish, engine_addrs = addrs("e2e", n)
    coord = DPCoordinator(report, publish, num_ranks=n)
    coord_t = threading.Thread(target=coord.run, daemon=True)
    coord_t.start()

    procs, threads = [], []
    for rank in range(n):
        cfg = tiny_cfg()
        params = llama.random_params(cfg.model, seed=rank)
        proc = DPEngineCoreProc(cfg, rank, *engine_addrs[rank],
                                report_addr=report, publish_addr=publish,
                                params=params, tokenizer=None,
                                lockstep=lockstep)
        procs.append(proc)
        t = threading.Thread(target=proc.run_busy_loop, daemon=True)
        t.start()
        threads.append(t)

    client = DPLBClient(engine_addrs, publish_addr=publish)
    n_reqs = 6
    for i in range(n_reqs):
        client.add_request(f"r{i}", [1 + i, 2, 3, 4],
                           SamplingParams(temperature=0.0, max_tokens=4,
                                          ignore_eos=True))
    finished = {}
    deadline = time.time() + 120
    while len(finished) < n_reqs and time.time() < deadline:
        for out in client.recv_outputs(timeout_ms=100):
            if out.finished:
                finished[out.request_id] = out.new_token_ids
    assert len(finished) == n_reqs, f"only {sorted(finished)} finished"
    for rid, toks in finished.items():
        assert len(toks) == 4, (rid, toks)
    # Load balancing: both ranks must have served requests.
    served = [len(p.engine.output_processor.states) for p in procs]
    rank_counts = [0, 0]
    for rid, rank in list(client.req_rank.items()):
        rank_counts[rank] += 1
    # req_rank is popped on finish; recount via outstanding history:
    # instead assert the router spread adds across ranks.
    assert client.outstanding == [0] * n
    client.shutdown_engines()
    for t in threads:
        t.join(timeout=10)
    coord.stop()
    coord_t.join(timeout=10)
    # Each rank's engine saw at least one request (balanced routing).
    for p in procs:
        assert p.engine.metrics.num_requests_total >= 1, (
            "routing sent everything to one rank")
    client.close()


def test_dp_lockstep_dummy_steps(cpu_devices):
    """An idle rank inside an active wave runs dummy steps."""
    n = 2
    report, publish, engine_addrs = addrs("lock", n)
    coord = DPCoordinator(report, publish, num_ranks=n)
    coord_t = threading.Thread(target=coord.run, daemon=True)
    coord_t.start()

    procs, threads = [], []
    for rank in range(n):
        cfg = tiny_cfg()
        params = llama.random_params(cfg.model, seed=rank)
        proc = DPEngineCoreProc(cfg, rank, *engine_addrs[rank],
                                report_addr=report, publish_addr=publish,
                                params=params, tokenizer=None,
                                lockstep=True)
        procs.append(proc)
        t = threading.Thread(target=proc.run_busy_loop, daemon=True)
        t.start()
        threads.append(t)

    client = DPLBClient(engine_addrs, publish_addr=publish)
    # Force all work onto rank 0 by sending directly to its socket.
    for i in range(2):
        client.clients[0].add_request(
            f"only0-{i}", [5, 6, 7, 8],
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))
    finished = 0
    deadline = time.time() + 120
    while finished < 2 and time.time() < deadline:
        for out in client.clients[0].recv_outputs(timeout_ms=100):
            if out.finished:
                finished += 1
    assert finished == 2
    time.sleep(0.3)  # let the wave-end broadcast land
    client.shutdown_engines()
    for t in threads:
        t.join(timeout=10)
    coord.stop()
    coord_t.join(timeout=10)
    # Rank 1 never had requests but participated in the wave.
    assert procs[1].dummy_steps > 0
    assert procs[1].engine.metrics.num_requests_total == 0
    client.close()


def test_coordinator_wave_numbering():
    report, publish, _ = addrs("wave", 0)
    coord = DPCoordinator(report, publish, num_ranks=2)
    coord_t = threading.Thread(target=coord.run, daemon=True)
    coord_t.start()

    import zmq

    from vllm_tpu.engine import protocol as proto
    ctx = zmq.Context()
    push = ctx.socket(zmq.PUSH)
    push.connect(report)
    sub = ctx.socket(zmq.SUB)
    sub.connect(publish)
    sub.setsockopt_string(zmq.SUBSCRIBE, "")

    def report_load(rank, running):
        push.send(
            proto.encode(proto.REPORT, {
                "rank": rank,
                "num_running": running,
                "num_waiting": 0,
            }))

    def drain(deadline_s=5.0):
        last = None
        end = time.time() + deadline_s
        while time.time() < end:
            if sub.poll(100):
                _, body = proto.decode(sub.recv())
                last = body
            elif last is not None:
                break
        return last

    # busy -> wave 1 active
    report_load(0, 3)
    st = drain()
    assert st is not None and st["active"] and st["wave"] == 1
    assert st["loads"][0] == 3
    # all idle -> wave 1 over
    report_load(0, 0)
    st = drain()
    assert st is not None and not st["active"]
    # busy again -> wave 2
    report_load(1, 1)
    st = drain()
    assert st is not None and st["active"] and st["wave"] == 2
    push.send(proto.encode(proto.SHUTDOWN, {}))
    coord_t.join(timeout=5)
    push.close(0)
    sub.close(0)
    ctx.term()
