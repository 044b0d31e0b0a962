"""Native chained FNV-1a block hashing (csrc/block_hash.cc).

Ref analog: the reference keeps block hashing optimized because it
runs per admitted block (vllm/v1/core/kv_cache_utils.py). Invariants:
native output is byte-identical to the pure-Python fallback, the
chain and extra-key semantics hold, batch == incremental, fnv hashes
are process-stable, and the engine's prefix cache works end to end on
the fnv default.
"""

import numpy as np
import pytest

from vllm_tpu.core.block_pool import (_extra_blob, chain_hashes_fnv,
                                      hash_block_tokens)


def _python_chain(parent, tokens, bs, extra=b""):
    """Force the Python fallback by bypassing the native lib."""
    import vllm_tpu.csrc as csrc
    saved = dict(csrc._lib_cache)
    csrc._lib_cache["block_hash"] = None
    try:
        return chain_hashes_fnv(parent, tokens, bs, extra)
    finally:
        csrc._lib_cache.clear()
        csrc._lib_cache.update(saved)


def test_native_matches_python():
    rng = np.random.default_rng(0)
    tokens = [int(t) for t in rng.integers(0, 50000, 96)]
    for extra in (b"", b"lora:foo|mmhash"):
        for parent in (None, b"\x11" * 8):
            nat = chain_hashes_fnv(parent, tokens, 16, extra)
            py = _python_chain(parent, tokens, 16, extra)
            assert nat == py
            assert len(nat) == 6
            assert all(len(h) == 8 for h in nat)


def test_chain_and_extra_semantics():
    tokens = list(range(64))
    base = chain_hashes_fnv(None, tokens, 16)
    # Chain: block i depends on all earlier blocks.
    mutated = tokens.copy()
    mutated[0] = 999
    assert chain_hashes_fnv(None, mutated, 16) != base
    assert all(a != b for a, b in
               zip(base, chain_hashes_fnv(None, mutated, 16)))
    # Extra key perturbs every hash (LoRA / mm content).
    assert chain_hashes_fnv(None, tokens, 16, b"x")[0] != base[0]
    # Batch == incremental (the kv-manager resume path).
    inc = chain_hashes_fnv(None, tokens[:32], 16)
    inc += chain_hashes_fnv(inc[-1], tokens[32:], 16)
    assert inc == base
    # Partial trailing block is ignored.
    assert chain_hashes_fnv(None, tokens + [1, 2, 3], 16) == base
    # hash_block_tokens fnv mode agrees block-by-block.
    h0 = hash_block_tokens(None, tuple(tokens[:16]), None, "fnv")
    assert h0 == base[0]


def test_fnv_is_process_stable():
    # Known-answer: FNV-1a-64 of the fixed byte stream must never
    # change across processes/versions (FileKVTier keys live on disk).
    got = chain_hashes_fnv(None, [1, 2, 3, 4], 4)[0]
    from vllm_tpu.core.block_pool import _FNV_OFF, _fnv1a
    want = _fnv1a(_FNV_OFF, np.asarray([1, 2, 3, 4],
                                       "<i4").tobytes())
    assert got == want.to_bytes(8, "little")


def test_engine_prefix_cache_on_fnv_default():
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4))
    assert cfg.cache.prefix_caching_hash_algo == "fnv"
    params = llama.random_params(cfg.model, seed=1)
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    prompt = [(3 * i + 1) % 250 for i in range(50)]

    def gen():
        rid = eng.add_request(prompt, SamplingParams(
            temperature=0.0, max_tokens=4, ignore_eos=True))
        out = None
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished and o.request_id == rid:
                    out = o.outputs[0].token_ids
        return out

    first = gen()
    stats = eng.scheduler.kv_cache_manager.block_pool.stats
    second = gen()
    assert second == first
    assert stats.hits > 0, "prefix cache never hit under fnv"
