"""Elastic EP — runtime expert-parallel world resize.

Ref analog: vllm/distributed/elastic_ep/elastic_state.py (scale
up/down) + the engine hook vllm/v1/engine/core.py:989-996 and its
tests (tests/distributed/test_elastic_ep*). Invariants checked here:
a mid-stream rescale ep=2 -> ep=4 -> ep=2 (trading tp for ep on a
fixed 4-device pool) preserves greedy outputs exactly (preempt +
recompute is transparent), re-queues in-flight requests, and keeps
EPLB placements valid at every world size.
"""

import copy
import dataclasses

import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             ParallelConfig, SchedulerConfig)
from vllm_tpu.models import mixtral
from vllm_tpu.parallel.eplb import set_active_state
from vllm_tpu.parallel.mesh import make_mesh
from vllm_tpu.sample.params import SamplingParams


def _cfg(ep=1, tp=1, eplb=False, redundant=0):
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=8, num_kv_heads=4, max_model_len=128,
            dtype="float32", architecture="MixtralForCausalLM",
            num_experts=4, num_experts_per_tok=2),
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
        parallel=ParallelConfig(expert_parallel_size=ep,
                                tensor_parallel_size=tp,
                                enable_eplb=eplb,
                                num_redundant_experts=redundant),
    )


PROMPTS = [[1, 9, 17, 33, 42], [7, 7, 7], [(3 * i) % 256
                                           for i in range(21)]]


def _run(engine, n_tokens=10, rescales=()):
    """Drive the engine to completion, applying (step_idx, fn) rescale
    hooks mid-stream. Returns per-request token lists."""
    ids = [
        engine.add_request(
            p, SamplingParams(temperature=0.0, max_tokens=n_tokens,
                              ignore_eos=True)) for p in PROMPTS
    ]
    done = {}
    hooks = dict(rescales)
    step = 0
    while engine.has_unfinished_requests() and step < 200:
        if step in hooks:
            hooks[step](engine)
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
        step += 1
    assert not engine.has_unfinished_requests()
    return [done[i] for i in ids]


@pytest.fixture(autouse=True)
def _reset_state():
    yield
    set_active_state(None)


def test_scale_ep_midstream_transparent(cpu_devices):
    from vllm_tpu.engine.llm_engine import LLMEngine
    base = _cfg()
    params = mixtral.random_params(base.model, seed=4)
    ref = _run(LLMEngine(base, params=copy.deepcopy(params),
                         tokenizer=None))

    cfg = _cfg(ep=2, tp=2, eplb=True, redundant=2)
    eng = LLMEngine(cfg, params=copy.deepcopy(params), tokenizer=None,
                    mesh=make_mesh(cfg.parallel))
    worlds = []

    def up(e):
        e.scale_ep(4, tensor_parallel_size=1)
        worlds.append((4, 1))

    def down(e):
        e.scale_ep(2, tensor_parallel_size=2)
        worlds.append((2, 2))

    # Steps are few: multi-step decode drains whole horizons per engine
    # step, so hook right after the first prefill/decode steps.
    got = _run(eng, rescales=[(1, up), (2, down)])
    assert got == ref, "rescale changed greedy outputs"
    assert worlds == [(4, 1), (2, 2)]
    # Mid-stream work really was drained + re-queued (preemptions).
    assert eng.scheduler.num_preemptions >= 2
    # EPLB survived both rescales with a valid placement at ep=2.
    assert eng.runner.eplb is not None
    p2l = next(iter(eng.runner._eplb_p2l.values()))
    assert len(p2l) % 2 == 0
    import numpy as np
    assert set(np.unique(p2l)) == set(range(4))  # all experts placed


def test_scale_ep_redundant_topup(cpu_devices):
    """E + redundant not divisible by the new world: scale_ep tops up
    the replica count to the next multiple (and returns to the base
    count when scaling back)."""
    from vllm_tpu.engine.llm_engine import LLMEngine
    cfg = _cfg(ep=2, tp=2, eplb=True, redundant=0)
    # E=4, redundant=0: ep=2 ok; scaling to ep=3 needs e_phys % 3 == 0
    # -> top-up to 6 physical (redundant 2).
    model = dataclasses.replace(cfg.model)
    params = mixtral.random_params(model, seed=1)
    eng = LLMEngine(cfg, params=params, tokenizer=None,
                    mesh=make_mesh(cfg.parallel))
    eng.scale_ep(3, tensor_parallel_size=1)
    assert eng.config.parallel.num_redundant_experts == 2
    p2l = next(iter(eng.runner._eplb_p2l.values()))
    assert len(p2l) == 6
    eng.scale_ep(2, tensor_parallel_size=2)
    assert eng.config.parallel.num_redundant_experts == 0
    got = _run(eng, n_tokens=4)
    ref = _run(LLMEngine(_cfg(), params=mixtral.random_params(
        model, seed=1), tokenizer=None), n_tokens=4)
    assert got == ref
