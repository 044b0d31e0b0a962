"""Engine ZMQ/msgpack protocol tests: codec round-trips, mock engine,
and a real engine behind the boundary.

Ref analog: tests/v1/test_serial_utils.py + the rust mock-engine
frontend tests.
"""

import threading
import uuid

import pytest

from vllm_tpu.engine import protocol as proto
from vllm_tpu.engine.core_client import ZmqSyncClient
from vllm_tpu.engine.core_proc import (EngineCoreProc, MockEngineProc,
                                       start_in_thread)
from vllm_tpu.sample.params import SamplingParams


def ipc_pair():
    base = f"ipc:///tmp/vllm_tpu_test_{uuid.uuid4().hex[:8]}"
    return base + "_in", base + "_out"


def test_codec_roundtrip():
    req = proto.WireRequest.from_params(
        "r1", [1, 2, 3], SamplingParams(max_tokens=7, temperature=0.5))
    t, body = proto.decode(proto.encode(proto.ADD, req))
    assert t == proto.ADD
    back = proto.WireRequest(**body)
    assert back.request_id == "r1"
    assert back.prompt_token_ids == [1, 2, 3]
    assert back.to_sampling_params().max_tokens == 7
    assert back.to_sampling_params().temperature == 0.5

    outs = [proto.WireOutput("r1", [5, 6], True, "length", None)]
    t2, body2 = proto.decode(proto.encode(proto.OUTPUTS, outs))
    assert proto.WireOutput(**body2[0]).new_token_ids == [5, 6]


def test_mock_engine_end_to_end():
    in_addr, out_addr = ipc_pair()
    mock = MockEngineProc(in_addr, out_addr)
    thread = start_in_thread(mock)
    client = ZmqSyncClient(in_addr, out_addr)
    client.add_request("a", [10, 20, 30], SamplingParams(max_tokens=5))
    got: list[int] = []
    finished = False
    for _ in range(50):
        for out in client.recv_outputs():
            if out.finished:
                got = out.new_token_ids
                finished = True
        if finished:
            break
    assert finished
    # mock rule: prompt[i % len] + 1
    assert got == [11, 21, 31, 11, 21]
    client.shutdown_engine()
    thread.join(timeout=5)
    assert not thread.is_alive()
    client.close()


def test_real_engine_behind_protocol():
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.models import llama

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
    )
    params = llama.random_params(cfg.model, seed=2)
    in_addr, out_addr = ipc_pair()
    proc = EngineCoreProc(cfg, in_addr, out_addr, params=params,
                          tokenizer=None)
    thread = start_in_thread(proc)
    client = ZmqSyncClient(in_addr, out_addr)
    client.add_request(
        "x", [1, 5, 9],
        SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True))
    client.add_request(
        "y", [7, 8],
        SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True))
    finals = {}
    for _ in range(200):
        for out in client.recv_outputs(timeout_ms=200):
            if out.finished:
                finals[out.request_id] = out.new_token_ids
        if len(finals) == 2:
            break
    assert len(finals["x"]) == 6
    assert len(finals["y"]) == 4
    client.shutdown_engine()
    thread.join(timeout=10)
    client.close()


def test_abort_over_protocol():
    in_addr, out_addr = ipc_pair()
    mock = MockEngineProc(in_addr, out_addr)
    thread = start_in_thread(mock)
    client = ZmqSyncClient(in_addr, out_addr)
    client.add_request("a", [1], SamplingParams(max_tokens=10_000))
    client.abort_requests(["a"])
    import time
    time.sleep(0.3)
    # Engine should go idle (no unbounded emission).
    drained = 0
    while client.recv_outputs(timeout_ms=100):
        drained += 1
        assert drained < 50, "abort did not stop emission"
    client.shutdown_engine()
    thread.join(timeout=5)
    client.close()
