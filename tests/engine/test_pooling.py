"""Pooling/embedding request path (ref analog: vllm pooling models +
PoolingParams; tests mirror tests/models/embedding in spirit).

Ground truth: pooling the raw model-forward hidden states directly.
The engine path must match exactly even under chunked prefill (mean
pooling accumulates across chunks) and alongside generate traffic.
"""

import numpy as np

import jax.numpy as jnp

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.models import llama
from vllm_tpu.ops.metadata import AttentionMetadata
from vllm_tpu.sample.params import PoolingParams, SamplingParams


def make_cfg(max_batched=32) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_model_len=128,
            dtype="float32",
        ),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=max_batched,
                                  max_num_seqs=4),
    )


def ref_hidden(cfg, params, prompt):
    """Full-prompt forward hidden states [T, E] (no engine)."""
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    T = len(prompt)
    caches = [
        jnp.zeros(
            kv_cache_shape(8, 16, cfg.model.num_kv_heads,
                           cfg.model.head_dim), jnp.float32)
        for _ in range(cfg.model.num_layers)
    ]
    bt = np.zeros((1, 6), np.int32)
    bt[0, :6] = [2, 3, 4, 5, 6, 7]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
    )
    hidden, _ = llama.forward(params, cfg.model,
                              jnp.asarray(prompt, jnp.int32),
                              jnp.arange(T, dtype=jnp.int32), caches,
                              meta)
    return np.asarray(hidden)


def make_llm(cfg, params):
    from vllm_tpu import LLM
    return LLM("", engine_config=cfg, params=params, tokenizer=None)


def _norm(v):
    return v / max(np.linalg.norm(v), 1e-12)


def test_embed_pooling_types_match_forward():
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    prompt = [1, 9, 17, 33, 42, 5, 6, 7]
    h = ref_hidden(cfg, params, prompt)
    llm = make_llm(cfg, params)

    for ptype, want in [("last", h[-1]), ("mean", h.mean(0)),
                        ("cls", h[0])]:
        out = llm.embed([prompt], PoolingParams(pooling_type=ptype))[0]
        got = np.asarray(out.embedding)
        np.testing.assert_allclose(got, _norm(want), rtol=2e-4,
                                   atol=2e-5, err_msg=ptype)
        assert out.finished and not out.outputs[0].token_ids


def test_embed_chunked_prefill_mean_exact():
    """Prompt longer than the token budget: mean pooling must be exact
    across prefill chunks."""
    cfg = make_cfg(max_batched=32)
    params = llama.random_params(cfg.model, seed=4)
    prompt = [(i * 7) % 250 for i in range(70)]  # 3 chunks
    h = ref_hidden(cfg, params, prompt)
    llm = make_llm(cfg, params)
    out = llm.embed([prompt], PoolingParams(pooling_type="mean",
                                            normalize=False))[0]
    np.testing.assert_allclose(np.asarray(out.embedding), h.mean(0),
                               rtol=2e-4, atol=2e-5)


def test_embed_dimensions_truncation():
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    prompt = [4, 5, 6]
    llm = make_llm(cfg, params)
    out = llm.embed([prompt], PoolingParams(dimensions=16))[0]
    assert len(out.embedding) == 16
    np.testing.assert_allclose(np.linalg.norm(out.embedding), 1.0,
                               rtol=1e-5)


def test_embed_alongside_generate():
    """Pooling and sampling requests share engine steps."""
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=5)
    llm = make_llm(cfg, params)
    gen_ref = llm.generate([[7, 8, 9]],
                           SamplingParams(temperature=0.0, max_tokens=6,
                                          ignore_eos=True))
    # Interleave: submit one generate + one embed, drive together.
    eng = llm.engine
    gid = eng.add_request([7, 8, 9],
                          SamplingParams(temperature=0.0, max_tokens=6,
                                         ignore_eos=True))
    eid = eng.add_request([1, 2, 3, 4],
                          SamplingParams(max_tokens=1),
                          pooling_params=PoolingParams())
    done = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o
    assert done[gid].outputs[0].token_ids == \
        gen_ref[0].outputs[0].token_ids
    assert done[eid].embedding is not None
    h = ref_hidden(cfg, params, [1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(done[eid].embedding),
                               _norm(h[-1]), rtol=2e-4, atol=2e-5)
