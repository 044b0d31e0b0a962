"""Sliding-window KV freeing: out-of-window blocks return to the pool
(bounded KV for long generations). Ref analog: SlidingWindowSpec
(kv_cache_interface.py:559) + SlidingWindowManager
remove_skipped_blocks (v1/core/single_type_kv_cache_manager.py)."""

import numpy as np

import jax.numpy as jnp

from vllm_tpu.core.kv_cache_manager import KVCacheManager
from vllm_tpu.core.request import Request
from vllm_tpu.sample.params import SamplingParams


def _req(rid, n_prompt):
    return Request(rid, list(range(1, n_prompt + 1)),
                   SamplingParams(max_tokens=256, ignore_eos=True))


def test_out_of_window_blocks_freed():
    bs, win = 16, 64
    mgr = KVCacheManager(num_blocks=64, block_size=bs,
                         enable_caching=False, sliding_window=win)
    req = _req("r0", 32)
    got = mgr.allocate_slots(req, 32)
    assert got is not None
    free0 = mgr.block_pool.num_free_blocks
    null_id = mgr.block_pool.null_block.block_id
    # Decode far past the window; real (non-null) blocks stay bounded.
    for step in range(200):
        req.num_computed_tokens = 32 + step
        req.append_output_token_ids([7])
        if mgr.allocate_slots(req, 1) is None:
            raise AssertionError("pool exhausted despite window")
    ids = mgr.get_block_ids("r0")
    real = [b for b in ids if b != null_id]
    # window 64 + current block => at most win/bs + 2 live blocks
    assert len(real) <= win // bs + 2, (len(real), len(ids))
    # leading blocks are nulled
    assert ids[0] == null_id and ids[1] == null_id
    # pool only lost the live blocks
    assert mgr.block_pool.num_free_blocks >= free0 - (win // bs + 2)
    mgr.free(req)
    assert mgr.block_pool.num_free_blocks == 63  # all but null


def test_no_window_no_freeing():
    mgr = KVCacheManager(num_blocks=32, block_size=16,
                         enable_caching=False, sliding_window=None)
    req = _req("r0", 16)
    mgr.allocate_slots(req, 16)
    for step in range(60):
        req.num_computed_tokens = 16 + step
        req.append_output_token_ids([7])
        mgr.allocate_slots(req, 1)
    null_id = mgr.block_pool.null_block.block_id
    assert all(b != null_id for b in mgr.get_block_ids("r0"))


def test_engine_sliding_window_bounded_kv():
    """E2E: long generation with a sliding-window model keeps KV usage
    bounded (the former behavior grew without freeing)."""
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama

    mc = ModelConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=128, num_layers=2, num_heads=4,
                     num_kv_heads=2, max_model_len=512, dtype="float32",
                     sliding_window=64)
    mc.eos_token_ids = []
    # Pool deliberately too small for 1x full-length sequence without
    # freeing: 512 tokens / bs16 = 32 blocks needed; give 16.
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_gpu_blocks=17,
                          enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=2),
    )
    params = llama.random_params(mc, seed=2)
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    rid = eng.add_request(
        list(range(5, 37)),
        SamplingParams(temperature=0.0, max_tokens=300, ignore_eos=True))
    out = None
    usage_peak = 0.0
    for _ in range(2000):
        if not eng.has_unfinished_requests():
            break
        for o in eng.step():
            if o.finished:
                out = o.outputs[0]
        usage_peak = max(usage_peak, eng.scheduler.kv_cache_manager.usage)
    assert out is not None and len(out.token_ids) == 300
    # 64-token window + slack: usage stays well under the 16-block pool
    assert usage_peak <= 0.75, usage_peak