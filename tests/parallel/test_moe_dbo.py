"""Dual-batch overlap in the EP MoE path (ops/moe._ep_moe).

Ref analog: vllm/v1/worker/ubatching.py + docs/design/dbo.md — the
reference interleaves two micro-batches on paired GPU streams so EP
all2all rides under expert compute. The TPU formulation is dataflow:
two independent (compute -> psum) chains that XLA's async-collective
scheduler overlaps. Invariants: bitwise-equal outputs vs the single-
batch path (dense and quantized experts), odd token counts, and the
lowered program carries two independent all-reduces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_tpu.config import ModelConfig, ParallelConfig
from vllm_tpu.ops.moe import fused_moe_apply
from vllm_tpu.parallel.mesh import (AXIS_EP, make_mesh,
                                    set_current_mesh)


@pytest.fixture
def ep_mesh(cpu_devices):
    mesh = make_mesh(ParallelConfig(expert_parallel_size=2,
                                    tensor_parallel_size=1))
    set_current_mesh(mesh)
    yield mesh
    set_current_mesh(None)


def _inputs(T=12, H=64, I=128, E=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    router = {"weight": jnp.asarray(
        rng.standard_normal((H, E)) * 0.1, jnp.float32)}
    w_gu = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05,
                       jnp.float32)
    w_dn = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05,
                       jnp.float32)
    return x, router, w_gu, w_dn


@pytest.mark.parametrize("T", [12, 13, 2])
def test_dbo_matches_single_batch(ep_mesh, T, monkeypatch):
    x, router, w_gu, w_dn = _inputs(T=T)
    sh = NamedSharding(ep_mesh, P(AXIS_EP))
    w_gu = jax.device_put(w_gu, sh)
    w_dn = jax.device_put(w_dn, sh)

    monkeypatch.setenv("VLLM_TPU_MOE_DBO", "0")
    ref = np.asarray(jax.jit(fused_moe_apply, static_argnums=(4, ))(
        x, router, w_gu, w_dn, 2))
    monkeypatch.setenv("VLLM_TPU_MOE_DBO", "1")
    got = np.asarray(jax.jit(fused_moe_apply, static_argnums=(4, ))(
        x, router, w_gu, w_dn, 2))
    np.testing.assert_array_equal(got, ref)


def test_dbo_two_independent_collectives(ep_mesh, monkeypatch):
    """The lowered module must contain one all-reduce per micro-batch
    (independent chains are what the async scheduler overlaps)."""
    monkeypatch.setenv("VLLM_TPU_MOE_DBO", "1")
    x, router, w_gu, w_dn = _inputs(T=8)
    sh = NamedSharding(ep_mesh, P(AXIS_EP))
    w_gu = jax.device_put(w_gu, sh)
    w_dn = jax.device_put(w_dn, sh)
    hlo = jax.jit(fused_moe_apply, static_argnums=(4, )).lower(
        x, router, w_gu, w_dn, 2).compiler_ir("hlo").as_hlo_text()
    assert hlo.count("all-reduce") >= 2


def test_dbo_quantized_experts(ep_mesh, monkeypatch):
    from vllm_tpu.quant.online import _quantize_experts_int4
    rng = np.random.default_rng(3)
    T, H, I, E = 10, 256, 256, 4
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    router = {"weight": jnp.asarray(
        rng.standard_normal((H, E)) * 0.1, jnp.float32)}
    w_gu = rng.standard_normal((E, H, 2 * I)).astype(np.float32) * 0.05
    w_dn = rng.standard_normal((E, I, H)).astype(np.float32) * 0.05
    gu_leaf = _quantize_experts_int4(w_gu)
    dn_leaf = _quantize_experts_int4(w_dn)
    sh = NamedSharding(ep_mesh, P(AXIS_EP))
    gu_leaf = {k: jax.device_put(v, sh) for k, v in gu_leaf.items()}
    dn_leaf = {k: jax.device_put(v, sh) for k, v in dn_leaf.items()}

    monkeypatch.setenv("VLLM_TPU_MOE_DBO", "0")
    ref = np.asarray(jax.jit(fused_moe_apply, static_argnums=(4, ))(
        x, router, gu_leaf, dn_leaf, 2))
    monkeypatch.setenv("VLLM_TPU_MOE_DBO", "1")
    got = np.asarray(jax.jit(fused_moe_apply, static_argnums=(4, ))(
        x, router, gu_leaf, dn_leaf, 2))
    np.testing.assert_array_equal(got, ref)
