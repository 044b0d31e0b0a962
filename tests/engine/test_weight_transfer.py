"""RL weight-sync transport (ref analog:
vllm/distributed/weight_transfer/ + set_weight_version): push updated
weights into a live engine over ZMQ, partial updates included."""

import asyncio

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.engine.state import flatten_params
from vllm_tpu.engine.weight_transfer import (apply_weight_update,
                                             pack_update,
                                             unpack_update)
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def make_engine(seed=0):
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
    )
    params = llama.random_params(cfg.model, seed=seed)
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    cfg.model.eos_token_ids = []
    return eng


def _greedy(eng, tag):
    eng.add_request([3, 5, 7, 9],
                    SamplingParams(temperature=0.0, max_tokens=6,
                                   ignore_eos=True),
                    request_id=tag)
    out = None
    while eng.has_unfinished_requests():
        for o in eng.step():
            out = o
    return out.outputs[0].token_ids


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    flat = {
        "layers::0::qkv_proj::weight": rng.standard_normal(
            (8, 16)).astype(np.float32),
        "norm": np.ones((4, ), np.float32),
    }
    frames = pack_update(flat, version=7)
    got, v = unpack_update(frames)
    assert v == 7
    for k in flat:
        np.testing.assert_array_equal(got[k], flat[k])


def test_apply_partial_update_changes_outputs():
    eng = make_engine(seed=0)
    base = _greedy(eng, "base")
    donor = llama.random_params(eng.config.model, seed=99)
    flat_donor = flatten_params(donor)
    # Partial: push only the lm_head — outputs must change, version
    # must bump, untouched leaves must stay identical.
    upd = {k: v for k, v in flat_donor.items() if k.startswith("lm_head")}
    assert upd
    before = flatten_params(eng.runner.params)
    apply_weight_update(eng, upd, version=3)
    assert eng.weight_version == 3
    after = flatten_params(eng.runner.params)
    for k in before:
        if k in upd:
            np.testing.assert_allclose(after[k], upd[k], rtol=1e-6)
        else:
            np.testing.assert_array_equal(after[k], before[k])
    assert _greedy(eng, "upd") != base


def test_apply_rejects_bad_updates():
    eng = make_engine()
    with pytest.raises(KeyError):
        apply_weight_update(eng, {"nope": np.zeros((1, ))}, 1)
    with pytest.raises(ValueError):
        apply_weight_update(eng, {"norm": np.zeros((3, ))}, 1)


def test_zmq_push_end_to_end():
    from vllm_tpu.engine.async_llm import AsyncLLM
    from vllm_tpu.engine.weight_transfer import WeightTransferClient

    async def main():
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=512, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=64, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=33),
            scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                      max_num_seqs=4),
        )
        params = llama.random_params(cfg.model, seed=0)
        allm = AsyncLLM(cfg, params=params, tokenizer=None)
        cfg.model.eos_token_ids = []
        addr = "ipc:///tmp/vllm_tpu_wt_test"
        allm.enable_weight_transfer(addr)
        try:
            async def gen(tag):
                final = None
                async for out in allm.generate(
                        [3, 5, 7, 9],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
                        request_id=tag):
                    final = out
                return final.outputs[0].token_ids

            base = await gen("base")
            donor = llama.random_params(cfg.model, seed=123)
            client = WeightTransferClient(addr)
            loop = asyncio.get_running_loop()
            ack = await loop.run_in_executor(
                None, lambda: client.push(donor, version=5))
            assert ack["ok"] and ack["version"] == 5
            assert allm.engine.weight_version == 5
            after = await gen("after")
            assert after != base
            client.close()
        finally:
            allm.shutdown()

    asyncio.run(main())
