"""W2A16 / W3A16 low-bit weight quantization.

Ref analog: the reference's INC low-bit WNA16 tiers (vllm/
model_executor/layers/quantization/inc/, bits {2,3}). Checks:
pack/unpack are exact inverses, dequant-matmul error is bounded by
the quantization grid, the engine serves an int3 model end to end,
and on the distilled (non-random) checkpoint the ppl ordering is
int3 < int2 with both inside their gate budgets.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.quant.kernels import (dequant_weight_xla, quantized_matmul,
                                    unpack_w2_jnp, unpack_w3_jnp)
from vllm_tpu.quant.online import (_quant_weight_low_bit,
                                   quantize_params_online)


@pytest.mark.parametrize("bits", [2, 3])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    K, N = 128, 16
    q = rng.integers(0, 1 << bits, (K, N)).astype(np.uint8)
    # Pack via the quantizer's own path: craft w so that levels == q.
    w = q.astype(np.float32)
    leaf = _quant_weight_low_bit(w, bits, group=64)
    unpack = unpack_w2_jnp if bits == 2 else unpack_w3_jnp
    got = np.asarray(unpack(leaf["qweight"]))
    # Same grid: levels must round-trip exactly (scale may differ per
    # group, but w==q with integer levels maps back to q).
    deq = np.asarray(dequant_weight_xla(leaf, jnp.float32))
    np.testing.assert_allclose(deq, w, atol=1e-3)
    assert got.shape == (K, N)
    assert leaf["bits"].shape == (bits, 0)


@pytest.mark.parametrize("bits", [2, 3])
def test_matmul_error_bounded(bits):
    rng = np.random.default_rng(1)
    K, N, T = 256, 32, 4
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    x = rng.standard_normal((T, K)).astype(np.float32)
    leaf = {k: v for k, v in _quant_weight_low_bit(w, bits).items()}
    out = np.asarray(quantized_matmul(jnp.asarray(x), leaf))
    ref = x @ w
    # Grid step per group ~ range/L; matmul error ~ sqrt(K) * step/2.
    L = (1 << bits) - 1
    step = (np.ptp(w.reshape(K // 64, 64, N), axis=1) / L).max()
    bound = 3 * np.sqrt(K) * step / 2 * np.abs(x).max()
    assert np.abs(out - ref).max() < bound


def test_engine_generate_int3():
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=17),
        scheduler=SchedulerConfig(max_num_batched_tokens=64,
                                  max_num_seqs=2))
    params = llama.random_params(cfg.model, seed=2)
    qp = quantize_params_online(params, "int3")
    eng = LLMEngine(cfg, params=qp, tokenizer=None)
    rid = eng.add_request([1, 2, 3, 4],
                          SamplingParams(temperature=0.0, max_tokens=6,
                                         ignore_eos=True))
    toks = []
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished and o.request_id == rid:
                toks = o.outputs[0].token_ids
    assert len(toks) == 6 and all(0 <= t < 256 for t in toks)


def test_distilled_ppl_ordering():
    """On real (trained) weights: more bits => less ppl damage, and
    both low-bit tiers stay inside their gate budgets."""
    import os
    from vllm_tpu.evals.corpus import eval_token_ids
    from vllm_tpu.evals.gate import DEFAULT_BUDGETS, quant_ppl_report
    from vllm_tpu.evals.train_tiny import load_npz, model_config

    asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                         "tiny_distilled.npz")
    params = load_npz(asset)
    cfg = model_config()
    ids = eval_token_ids(vocab_size=512)[:768]
    rep = quant_ppl_report(params, cfg, ["int2", "int3"], ids)
    base = rep["baseline"]
    assert base < rep["int3"] < rep["int2"]
    assert (rep["int3"] - base) / base < DEFAULT_BUDGETS["int3"]
    assert (rep["int2"] - base) / base < DEFAULT_BUDGETS["int2"]


def test_nf4_roundtrip_and_matmul():
    """bnb-class NF4: exact levels round-trip, matmul error within the
    codebook grid, engine serves it."""
    from vllm_tpu.quant.kernels import dequant_nf4_xla
    from vllm_tpu.quant.online import NF4_LEVELS, _quant_weight_nf4

    rng = np.random.default_rng(5)
    K, N = 128, 32
    # Weights exactly on codebook levels scaled per block round-trip.
    scale = rng.random((K // 64, 1, N)).astype(np.float32) + 0.5
    # Force one exact -1.0/+1.0 per block so absmax == the scale.
    lv = NF4_LEVELS[rng.integers(0, 16, (K // 64, 64, N))]
    lv[:, 0, :] = 1.0
    w = (lv * scale).reshape(K, N).astype(np.float32)
    leaf = _quant_weight_nf4(w)
    deq = np.asarray(dequant_nf4_xla(leaf, jnp.float32))
    np.testing.assert_allclose(deq, w, rtol=2e-6, atol=2e-6)
    # Random weights: error bounded by half the coarsest level gap.
    w2 = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    leaf2 = _quant_weight_nf4(w2)
    deq2 = np.asarray(dequant_nf4_xla(leaf2, jnp.float32))
    gap = np.max(np.diff(NF4_LEVELS)) / 2
    bound = gap * np.abs(w2.reshape(K // 64, 64, N)).max(axis=1)
    assert (np.abs(deq2 - w2).reshape(K // 64, 64, N).max(axis=1)
            <= bound + 1e-6).all()
    x = rng.standard_normal((3, K)).astype(np.float32)
    out = np.asarray(quantized_matmul(jnp.asarray(x), leaf2))
    np.testing.assert_allclose(out, x @ deq2, rtol=1e-4, atol=1e-4)


def test_nf4_distilled_gate():
    """NF4 on the trained checkpoint: inside its budget and better
    than plain int3 (16 well-placed levels beat 8 uniform ones)."""
    import os
    from vllm_tpu.evals.corpus import eval_token_ids
    from vllm_tpu.evals.gate import DEFAULT_BUDGETS, quant_ppl_report
    from vllm_tpu.evals.train_tiny import load_npz, model_config

    asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                         "tiny_distilled.npz")
    params = load_npz(asset)
    ids = eval_token_ids(vocab_size=512)[:768]
    rep = quant_ppl_report(params, model_config(), ["nf4", "int3"], ids)
    base = rep["baseline"]
    assert (rep["nf4"] - base) / base < DEFAULT_BUDGETS["nf4"]
    assert rep["nf4"] < rep["int3"]
