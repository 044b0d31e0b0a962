"""Expert-parallel correctness on a virtual 8-device CPU mesh.

EP = stacked-expert axis sharded over the ``ep`` mesh axis, computed
via shard_map (manual over ep only) with a psum combine — see
ops/moe._ep_moe. Ref analog: FusedMoE EP slicing + all2all dispatch
(vllm/distributed/device_communicators/all2all.py), validated like
the reference's tests/distributed suite but on a virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             ParallelConfig, SchedulerConfig)
from vllm_tpu.models import mixtral
from vllm_tpu.parallel.mesh import (AXIS_EP, make_mesh,
                                    set_current_mesh)
from vllm_tpu.ops.moe import fused_moe_apply


def make_cfg(ep: int, tp: int) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=8,
            num_kv_heads=4,
            max_model_len=128,
            dtype="float32",
            architecture="MixtralForCausalLM",
            num_experts=8,
            num_experts_per_tok=2,
        ),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4),
        parallel=ParallelConfig(expert_parallel_size=ep,
                                tensor_parallel_size=tp),
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


def test_mixtral_ep4_tp2_matches_single_device(cpu_devices):
    cfg = make_cfg(ep=4, tp=2)
    params = mixtral.random_params(cfg.model, seed=11)
    ref = run_generate(make_cfg(ep=1, tp=1), params, mesh=None)
    got = run_generate(cfg, params, mesh=make_mesh(cfg.parallel))
    assert got == ref


def test_ep_moe_quant_matches_dense(cpu_devices):
    """WNA16 expert leaves under EP (local dequant inside shard_map)
    match the dense MoE with the dequantized weights."""
    from tests.quant.test_moe_wna16 import make_expert_leaf
    rng = np.random.default_rng(5)
    NE, H, I, T, top_k = 8, 256, 256, 12, 2
    gu_leaf, gu_ref = make_expert_leaf(rng, NE, H, 2 * I)
    dn_leaf, dn_ref = make_expert_leaf(rng, NE, I, H)
    router = {"weight": jnp.asarray(
        rng.standard_normal((H, NE)).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))

    dense = fused_moe_apply(x, router, jnp.asarray(gu_ref),
                            jnp.asarray(dn_ref), top_k)

    mesh = make_mesh(ParallelConfig(expert_parallel_size=4,
                                    tensor_parallel_size=2))
    set_current_mesh(mesh)
    try:
        sh = NamedSharding(mesh, P(AXIS_EP))
        gu = {k: jax.device_put(v, sh) for k, v in gu_leaf.items()}
        dn = {k: jax.device_put(v, sh) for k, v in dn_leaf.items()}
        quant = jax.jit(fused_moe_apply, static_argnums=(4, ))(
            x, router, gu, dn, top_k)
    finally:
        set_current_mesh(None)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(dense),
                               rtol=2e-3, atol=2e-3)


def test_ep_requires_divisible_experts(cpu_devices):
    from vllm_tpu.parallel.shard import full_param_shardings
    cfg = make_cfg(ep=4, tp=2)
    cfg.model.num_experts = 6  # not divisible by 4
    params = mixtral.random_params(cfg.model, seed=0)
    with pytest.raises(ValueError, match="divide the expert stack"):
        full_param_shardings(cfg.model, params,
                             make_mesh(cfg.parallel))
