"""Multi-LoRA runtime: apply-op parity, registry stacking, PEFT
loading, and e2e generation vs merged weights.

Ref analog: tests/lora/ (vllm) — here the ground truth is manual
weight merging (W' = W + scale * A @ B), which a greedy engine run
must reproduce token-for-token."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.lora import LoRARegistry, from_arrays, load_peft_adapter
from vllm_tpu.models import llama
from vllm_tpu.ops.lora import lora_apply
from vllm_tpu.sample.params import SamplingParams

MC = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
          num_layers=2, num_heads=4, num_kv_heads=2, max_model_len=96,
          dtype="float32")


def test_lora_apply_matches_per_row():
    rng = np.random.default_rng(0)
    T, K, N, r, L = 6, 32, 48, 4, 3
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    base = jnp.asarray(rng.standard_normal((T, N)), jnp.float32)
    A = np.zeros((L + 1, K, r), np.float32)
    B = np.zeros((L + 1, r, N), np.float32)
    scale = np.zeros((L + 1, ), np.float32)
    for i in range(1, L + 1):
        A[i] = rng.standard_normal((K, r))
        B[i] = rng.standard_normal((r, N))
        scale[i] = 0.5 * i
    idx = np.asarray([0, 1, 2, 3, 1, 0], np.int32)
    stack = {"A": jnp.asarray(A), "B": jnp.asarray(B),
             "scale": jnp.asarray(scale)}
    got = np.asarray(lora_apply(x, base, stack, jnp.asarray(idx)))
    ref = np.asarray(base).copy()
    xn = np.asarray(x)
    for t in range(T):
        s = idx[t]
        if s > 0:
            ref[t] += scale[s] * (xn[t] @ A[s]) @ B[s]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def _mk_adapter(rng, name, cfg: ModelConfig, rank=4, scaling=0.5,
                mods=("q_proj", "o_proj", "down_proj")):
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    E, I = cfg.hidden_size, cfg.intermediate_size
    dims = {
        "q_proj": (E, H * D), "k_proj": (E, KH * D),
        "v_proj": (E, KH * D), "o_proj": (H * D, E),
        "gate_proj": (E, I), "up_proj": (E, I), "down_proj": (I, E),
    }
    tensors = {}
    for li in range(cfg.num_layers):
        for m in mods:
            K, N = dims[m]
            tensors[(li, m)] = (
                rng.standard_normal((K, rank)).astype(np.float32) * 0.05,
                rng.standard_normal((rank, N)).astype(np.float32) * 0.05)
    return from_arrays(name, rank, scaling, tensors)


def _merged_params(params, adapter, cfg: ModelConfig):
    """Manually merge adapter deltas into dense weights."""
    import jax
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    E, I = cfg.hidden_size, cfg.intermediate_size
    offs = {
        "q_proj": ("qkv_proj", 0), "k_proj": ("qkv_proj", H * D),
        "v_proj": ("qkv_proj", (H + KH) * D),
        "o_proj": ("o_proj", 0),
        "gate_proj": ("gate_up_proj", 0), "up_proj": ("gate_up_proj", I),
        "down_proj": ("down_proj", 0),
    }
    out = jax.tree.map(lambda x: x, params)
    for (li, m), (A, B) in adapter.tensors.items():
        leaf, n_off = offs[m]
        w = np.array(out["layers"][li][leaf]["weight"], np.float32)
        delta = adapter.scaling * (A @ B)
        w[:, n_off:n_off + B.shape[1]] += delta
        out["layers"][li][leaf]["weight"] = jnp.asarray(w)
    return out


def _engine(params, lora=None):
    mc = ModelConfig(**MC)
    mc.eos_token_ids = []
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_gpu_blocks=33),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4),
    )
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    if lora is not None:
        for a in lora:
            eng.add_lora(a.name, adapter=a)
    return eng


def _gen(eng, prompt, lora_name=None, max_tokens=10):
    rid = eng.add_request(prompt,
                          SamplingParams(temperature=0.0,
                                         max_tokens=max_tokens,
                                         ignore_eos=True),
                          lora_name=lora_name)
    out = None
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished and o.request_id == rid:
                out = o.outputs[0].token_ids
    return out


def test_e2e_lora_matches_merged_weights():
    rng = np.random.default_rng(1)
    mc = ModelConfig(**MC)
    params = llama.random_params(mc, seed=7)
    adapter = _mk_adapter(rng, "ad1", mc)
    merged = _merged_params(params, adapter, mc)
    prompt = list(range(10, 30))

    base_eng = _engine(params, lora=[adapter])
    with_lora = _gen(base_eng, prompt, lora_name="ad1")
    without = _gen(base_eng, prompt, lora_name=None)

    merged_eng = _engine(merged)
    ref = _gen(merged_eng, prompt)

    assert with_lora == ref, (with_lora, ref)
    assert without != ref  # the adapter actually changed the output


def test_mixed_batch_adapters():
    rng = np.random.default_rng(2)
    mc = ModelConfig(**MC)
    params = llama.random_params(mc, seed=9)
    a1 = _mk_adapter(rng, "a1", mc, mods=("q_proj", "v_proj"))
    a2 = _mk_adapter(rng, "a2", mc, mods=("gate_proj", "up_proj"))
    eng = _engine(params, lora=[a1, a2])
    prompts = [list(range(5, 25)), list(range(7, 27)),
               list(range(9, 29))]
    names = ["a1", "a2", None]
    rids = [eng.add_request(p, SamplingParams(temperature=0.0,
                                              max_tokens=8,
                                              ignore_eos=True),
                            lora_name=n)
            for p, n in zip(prompts, names)]
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
    # each ran concurrently and got its own adapter: compare against
    # solo runs
    for p, n in zip(prompts, names):
        eng2 = _engine(params, lora=[a1, a2])
        assert _gen(eng2, p, lora_name=n, max_tokens=8) == \
            outs[rids[prompts.index(p)]]


def test_peft_checkpoint_load(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(3)
    r = 8
    tensors = {}
    for li in range(2):
        p = f"base_model.model.model.layers.{li}.self_attn.q_proj"
        tensors[f"{p}.lora_A.weight"] = rng.standard_normal(
            (r, 64)).astype(np.float32)  # [r, K] torch layout
        tensors[f"{p}.lora_B.weight"] = rng.standard_normal(
            (64, r)).astype(np.float32)  # [N, r]
    save_file(tensors, os.path.join(str(tmp_path),
                                    "adapter_model.safetensors"))
    with open(os.path.join(str(tmp_path), "adapter_config.json"),
              "w") as f:
        json.dump({"r": r, "lora_alpha": 16,
                   "target_modules": ["q_proj"]}, f)
    a = load_peft_adapter("x", str(tmp_path))
    assert a.rank == 8 and a.scaling == 2.0
    A, B = a.tensors[(0, "q_proj")]
    assert A.shape == (64, r) and B.shape == (r, 64)
    np.testing.assert_array_equal(
        A, tensors["base_model.model.model.layers.0.self_attn."
                   "q_proj.lora_A.weight"].T)


def test_registry_rejects_unknown():
    mc = ModelConfig(**MC)
    reg = LoRARegistry(2, model_config=mc)
    with pytest.raises(KeyError):
        reg.slot_of("nope")
    assert reg.slot_of(None) == 0
