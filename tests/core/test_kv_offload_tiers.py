"""Tiered KV offload: RAM tier backed by a filesystem spill tier.

Ref analog: vllm/v1/kv_offload/tiering/ (fs/object backends below the
CPU tier) + the async swap machinery. Invariants: RAM evictions demote
to disk (write-behind, readable while in flight), tier hits promote
back to RAM, disk LRU respects its byte budget, and — the correctness
gate — generation served through a block that round-tripped
RAM -> disk -> RAM is greedy-identical to local compute.
"""

import numpy as np

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.core.kv_offload import FileKVTier, TieredHostKVPool
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def _entry(seed, shape=(2, 4, 16, 64)):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape, np.float32)


def test_file_tier_roundtrip(tmp_path):
    tier = FileKVTier(str(tmp_path), max_bytes=1 << 30)
    d = _entry(0)
    tier.put(b"h0", d, None)
    # Readable immediately (possibly still in flight).
    got = tier.get(b"h0")
    np.testing.assert_array_equal(got[0], d)
    tier.flush()
    assert (tmp_path / (b"h0".hex() + ".npz")).exists()
    # Read back from disk (drop in-flight path).
    got2 = tier.get(b"h0")
    np.testing.assert_array_equal(got2[0], d)
    assert tier.get(b"missing") is None
    # Scales plane round-trips.
    s = _entry(1, (2, 8, 128))
    tier.put(b"h1", _entry(2), s)
    tier.flush()
    np.testing.assert_array_equal(tier.get(b"h1")[1], s)


def test_file_tier_lru_budget(tmp_path):
    one = _entry(0).nbytes
    tier = FileKVTier(str(tmp_path), max_bytes=int(one * 2.5))
    for i in range(4):
        tier.put(f"h{i}".encode(), _entry(i), None)
        tier.flush()
    assert tier.evictions >= 1
    assert tier.num_blocks <= 2
    # Newest entries survive.
    assert b"h3" in tier
    assert b"h0" not in tier
    assert tier.get(b"h0") is None


def test_tiered_pool_demote_promote(tmp_path):
    one = _entry(0).nbytes
    pool = TieredHostKVPool(int(one * 2.5),
                            FileKVTier(str(tmp_path), 1 << 30))
    datas = {f"h{i}".encode(): _entry(i) for i in range(4)}
    for h, d in datas.items():
        pool.store(h, d, None)
    # RAM overflowed -> oldest demoted to disk, still visible.
    assert pool.demotions >= 1
    pool.tier.flush()
    for h, d in datas.items():
        assert h in pool
        got = pool.get(h)
        np.testing.assert_array_equal(got[0], d)
    assert pool.promotions >= 1


def _cfg(num_blocks=65, host_swap_bytes=0, offload_dir=None,
         ram_bytes=None):
    return EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=160,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=num_blocks,
                          host_swap_bytes=(ram_bytes or host_swap_bytes),
                          offload_dir=offload_dir),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
    )


def _gen(engine, prompt, max_tokens=6):
    rid = engine.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=max_tokens,
                               ignore_eos=True))
    out = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                out = o.outputs[0].token_ids
    return out


def test_fs_tier_e2e_greedy_identical(tmp_path):
    """Device pool too small to keep A cached; RAM tier too small to
    hold all of A's evicted blocks -> some demote to disk; re-running A
    swaps in through the fs tier. Output must match local compute."""
    prompt_a = [(i * 7 + 1) % 250 for i in range(50)]
    prompt_b = [(i * 11 + 3) % 250 for i in range(140)]
    params = llama.random_params(_cfg().model, seed=3)
    ref = _gen(LLMEngine(_cfg(), params=params, tokenizer=None),
               prompt_a)

    # One block entry = 2 layers x 2*KH x bs x Dp floats; RAM tier
    # sized to ~2 blocks so the rest spill to disk.
    block_bytes = 2 * (2 * 2) * 16 * 128 * 4
    cfg = _cfg(num_blocks=11, ram_bytes=int(block_bytes * 1.2),
               offload_dir=str(tmp_path))
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    pool = engine.scheduler.host_kv_pool
    assert isinstance(pool, TieredHostKVPool)
    assert _gen(engine, prompt_a) == ref
    _gen(engine, prompt_b[:130])  # force device + RAM eviction
    pool.tier.flush()
    assert pool.demotions > 0, "RAM tier never spilled to disk"
    out = _gen(engine, prompt_a)
    assert engine.scheduler.num_swap_ins > 0
    assert pool.promotions > 0, "fs tier never promoted"
    assert out == ref


# -- round 5: shared object-store tier (cross-engine prefix reuse) ----

def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_object_tier_roundtrip_and_degradation():
    from vllm_tpu.core.kv_offload import ObjectKVServer, ObjectKVTier
    port = _free_port()
    srv = ObjectKVServer(f"tcp://127.0.0.1:{port}", max_bytes=1 << 30)
    try:
        tier = ObjectKVTier(f"tcp://127.0.0.1:{port}")
        d = _entry(0)
        s = _entry(1, (2, 8, 128))
        tier.put(b"h0", d, s)
        tier.flush()
        got = tier.get(b"h0")
        np.testing.assert_array_equal(got[0], d)
        np.testing.assert_array_equal(got[1], s)
        assert b"h0" in tier and b"nope" not in tier
        assert tier.get(b"nope") is None
    finally:
        srv.close()
    # store gone: the tier degrades to misses, never stalls
    t2 = ObjectKVTier(f"tcp://127.0.0.1:{port}", timeout_ms=100)
    assert t2.get(b"h0") is None
    assert b"h0" not in t2
    t2.put(b"hX", _entry(2), None)
    t2.flush()
    assert t2.write_errors >= 1


def test_object_tier_cross_engine_prefix_reuse():
    """Engine A's evictions land in the shared store; a FRESH engine B
    (never saw the prompt) gets prefix hits through it and produces
    identical greedy output — the cluster-wide KV reuse the obj tier
    exists for (ref: kv_offload/tiering obj + lmcache-class
    connectors)."""
    from vllm_tpu.core.kv_offload import ObjectKVServer
    port = _free_port()
    srv = ObjectKVServer(f"tcp://127.0.0.1:{port}", max_bytes=1 << 30)
    try:
        prompt_a = [(i * 7 + 1) % 250 for i in range(64)]
        prompt_b = [(i * 11 + 3) % 250 for i in range(140)]
        params = llama.random_params(_cfg().model, seed=3)
        ref = _gen(LLMEngine(_cfg(), params=params, tokenizer=None),
                   prompt_a)

        def obj_cfg():
            c = _cfg(num_blocks=11, ram_bytes=2 * (2 * 2) * 16 * 128 * 4)
            c.cache.kv_object_store_addr = f"tcp://127.0.0.1:{port}"
            return c

        eng_a = LLMEngine(obj_cfg(), params=params, tokenizer=None)
        assert _gen(eng_a, prompt_a) == ref
        # Two eviction waves: the first pushes prompt_a's blocks into
        # the RAM tier (tail-first), the second cycles the RAM tier so
        # the prefix HEAD block also demotes to the shared store (the
        # store must hold a contiguous prefix for engine B to hit).
        _gen(eng_a, prompt_b[:130])
        _gen(eng_a, [(i * 13 + 5) % 250 for i in range(140)][:130])
        eng_a.scheduler.host_kv_pool.tier.flush()

        # Fresh engine B: prefix must come through the shared store.
        eng_b = LLMEngine(obj_cfg(), params=params, tokenizer=None)
        out_b = _gen(eng_b, prompt_a)
        assert out_b == ref
        assert eng_b.scheduler.num_swap_ins > 0, (
            "engine B never pulled blocks from the shared store")
        assert eng_b.scheduler.host_kv_pool.tier.hits > 0
    finally:
        srv.close()
