"""Tensor-parallel correctness on a virtual 8-device CPU mesh.

Ref analog: tests/distributed/ in the reference (single-node
multi-process); here the mesh is virtual (conftest forces 8 CPU
devices) and XLA runs true SPMD.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             ParallelConfig, SchedulerConfig)
from vllm_tpu.models import llama
from vllm_tpu.parallel.mesh import make_mesh
from vllm_tpu.parallel.shard import full_param_shardings


def make_cfg(tp: int) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256,  # divisible by 8
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=8,
            num_kv_heads=4,
            max_model_len=128,
            dtype="float32",
        ),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
        parallel=ParallelConfig(tensor_parallel_size=tp),
    )


def run_generate(cfg: EngineConfig, params, mesh=None):
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.sample.params import SamplingParams
    engine = LLMEngine(cfg, params=params, tokenizer=None, mesh=mesh)
    prompts = [[1, 9, 17, 33, 42], [7, 7, 7], [100, 101, 102, 103]]
    ids = [
        engine.add_request(p,
                           SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True))
        for p in prompts
    ]
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    return [done[i] for i in ids]


def test_tp8_matches_single_device(cpu_devices):
    cfg = make_cfg(tp=8)
    params = llama.random_params(cfg.model, seed=3)
    ref = run_generate(make_cfg(tp=1), params, mesh=None)
    mesh = make_mesh(cfg.parallel)
    got = run_generate(cfg, params, mesh=mesh)
    assert got == ref


def test_param_shardings_cover_tree(cpu_devices):
    cfg = make_cfg(tp=8)
    params = llama.random_params(cfg.model)
    mesh = make_mesh(cfg.parallel)
    sh = full_param_shardings(cfg.model, params, mesh)
    # Same tree structure.
    jax.tree.map(lambda a, b: None, params, sh)
    # Column-parallel out dim sharded 8-way.
    qkv = sh["layers"][0]["qkv_proj"]["weight"]
    w = params["layers"][0]["qkv_proj"]["weight"]
    shards = qkv.shard_shape(w.shape)
    assert shards[1] == w.shape[1] // 8 and shards[0] == w.shape[0]


def test_kv_cache_sharding_replicates_when_indivisible(cpu_devices):
    from vllm_tpu.parallel.shard import kv_cache_sharding
    cfg = make_cfg(tp=8).model
    mesh = make_mesh(ParallelConfig(tensor_parallel_size=8))
    sh, _ = kv_cache_sharding(cfg, mesh)  # 2*KH=8 divisible
    # Cache layout [num_blocks, 2*KH, block_size, Dp]: heads (axis 1)
    # shard 8-way; block_size/Dp stay whole.
    assert sh.shard_shape((10, 8, 16, 128)) == (10, 1, 16, 128)
    cfg2 = ModelConfig(num_heads=6, num_kv_heads=3, hidden_size=48,
                       head_dim=8)
    sh2, _ = kv_cache_sharding(cfg2, mesh)  # 2*KH=6 not divisible by 8
    assert sh2.shard_shape((10, 6, 16, 128)) == (10, 6, 16, 128)


def test_mixtral_tp8_matches_single_device(cpu_devices):
    from vllm_tpu.models import mixtral
    cfg = make_cfg(tp=8)
    cfg.model.architecture = "MixtralForCausalLM"
    cfg.model.num_experts = 4
    cfg.model.num_experts_per_tok = 2
    params = mixtral.random_params(cfg.model, seed=9)
    ref = run_generate(make_mixtral_cfg(1), params, mesh=None)
    got = run_generate(cfg, params, mesh=make_mesh(cfg.parallel))
    assert got == ref


def make_mixtral_cfg(tp):
    cfg = make_cfg(tp=tp)
    cfg.model.architecture = "MixtralForCausalLM"
    cfg.model.num_experts = 4
    cfg.model.num_experts_per_tok = 2
    return cfg
