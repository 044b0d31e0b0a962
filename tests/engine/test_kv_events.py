"""KV event publishing: a consumer replaying the BlockStored /
BlockRemoved / AllBlocksCleared stream reconstructs the pool's exact
prefix-cache state (ref analog: vllm/distributed/kv_events.py:50-245 +
tests/distributed/test_events).

Covers both the live PUB stream and the late-subscriber replay path.
"""

import socket

import numpy as np
import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, KVEventsConfig,
                             ModelConfig, SchedulerConfig)
from vllm_tpu.engine.kv_events import (AllBlocksCleared, BlockRemoved,
                                       BlockStored, EventBatch)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams

zmq = pytest.importorskip("zmq")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def make_engine(pub_port: int, replay_port: int) -> LLMEngine:
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        # Small pool: forces evictions (BlockRemoved events).
        cache=CacheConfig(block_size=16, num_gpu_blocks=17,
                          enable_prefix_caching=True),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=2),
        kv_events=KVEventsConfig(
            enable_kv_cache_events=True,
            endpoint=f"tcp://127.0.0.1:{pub_port}",
            replay_endpoint=f"tcp://127.0.0.1:{replay_port}"),
    )
    params = llama.random_params(cfg.model, seed=0)
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    cfg.model.eos_token_ids = []
    return eng


def _apply(state: set, ev) -> None:
    if isinstance(ev, BlockStored):
        state.update(ev.block_hashes)
        assert ev.block_size == 16
        assert len(ev.token_ids) == 16 * len(ev.block_hashes)
    elif isinstance(ev, BlockRemoved):
        state.difference_update(ev.block_hashes)
    elif isinstance(ev, AllBlocksCleared):
        state.clear()


def _pool_state(eng) -> set:
    pool = eng.scheduler.kv_cache_manager.block_pool
    return {b.block_hash for b in pool.blocks
            if b.block_hash is not None}


def test_event_stream_reconstructs_pool_state():
    pub_port, replay_port = _free_port(), _free_port()
    eng = make_engine(pub_port, replay_port)
    sub = zmq.Context.instance().socket(zmq.SUB)
    sub.connect(f"tcp://127.0.0.1:{pub_port}")
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    import time
    time.sleep(1.0)  # PUB/SUB join (generous: suite runs under load)

    rng = np.random.default_rng(0)
    shared = [int(x) for x in rng.integers(10, 500, 40)]
    # Two generations with a shared 40-token prefix, then divergent
    # tails, then a third long prompt that forces eviction.
    for i, tail_len in enumerate((10, 14, 90)):
        tail = [int(x) for x in rng.integers(10, 500, tail_len)]
        eng.add_request(shared + tail if i < 2 else tail,
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True),
                        request_id=f"r{i}")
        while eng.has_unfinished_requests():
            eng.step()
    # reset emits AllBlocksCleared
    assert eng.scheduler.kv_cache_manager.block_pool.reset_prefix_cache()
    eng.step()  # flush happens inside step; force one more flush
    eng._flush_kv_events()

    # Drain the SUB stream.
    state: set = set()
    seqs = []
    poller = zmq.Poller()
    poller.register(sub, zmq.POLLIN)
    while True:
        if not dict(poller.poll(timeout=500)):
            break
        topic, seq, payload = sub.recv_multipart()
        seqs.append(int.from_bytes(seq, "big"))
        for ev in EventBatch.unpack(payload).events:
            _apply(state, ev)
    assert seqs == sorted(seqs) and len(seqs) > 0
    assert state == _pool_state(eng)  # empty after reset

    # Run more traffic AFTER the reset so the final state is nonempty.
    for i in range(2):
        eng.add_request(shared + [600 + i],
                        SamplingParams(temperature=0.0, max_tokens=2,
                                       ignore_eos=True),
                        request_id=f"post{i}")
        while eng.has_unfinished_requests():
            eng.step()
    while True:
        if not dict(poller.poll(timeout=500)):
            break
        _t, seq, payload = sub.recv_multipart()
        seqs.append(int.from_bytes(seq, "big"))
        for ev in EventBatch.unpack(payload).events:
            _apply(state, ev)
    assert len(state) > 0
    assert state == _pool_state(eng)

    # Late subscriber: replay from seq 0 rebuilds the same state.
    req = zmq.Context.instance().socket(zmq.REQ)
    req.connect(f"tcp://127.0.0.1:{replay_port}")
    req.send((0).to_bytes(8, "big"))
    parts = req.recv_multipart()
    assert parts[-2] == b""
    next_seq = int.from_bytes(parts[-1], "big")
    assert next_seq == max(seqs) + 1
    replay_state: set = set()
    for i in range(0, len(parts) - 2, 2):
        for ev in EventBatch.unpack(parts[i + 1]).events:
            _apply(replay_state, ev)
    assert replay_state == _pool_state(eng)

    sub.close(linger=0)
    req.close(linger=0)
    eng.kv_event_publisher.close()
