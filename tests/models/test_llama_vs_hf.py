"""Numerical parity of the functional Llama vs HuggingFace transformers.

Ref analog: the reference's HfRunner/VllmRunner closeness fixtures
(ref: tests/conftest.py:367,938) — greedy logits parity on a tiny
random-weight model, exercising the full paged path: loader fusion,
rope, KV write-through, ragged paged attention (prefill AND decode).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.loader.hf_config import model_config_from_hf
from vllm_tpu.loader.safetensors_loader import load_llama_params
from vllm_tpu.models import llama
from vllm_tpu.ops.kv_cache import kv_cache_shape
from vllm_tpu.ops.metadata import AttentionMetadata

BLOCK_SIZE = 16
NUM_BLOCKS = 64


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    """Save a tiny random HF llama checkpoint to disk."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    path = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def make_prefill_meta(num_tokens: int, block_ids: list[int]):
    """Single-request full-prefill metadata."""
    max_blocks = 8
    bt = np.zeros((1, max_blocks), np.int32)
    bt[0, :len(block_ids)] = block_ids
    slots = np.array([
        block_ids[i // BLOCK_SIZE] * BLOCK_SIZE + i % BLOCK_SIZE
        for i in range(num_tokens)
    ], np.int32)
    return AttentionMetadata(
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, num_tokens], dtype=jnp.int32),
        seq_lens=jnp.asarray([num_tokens], dtype=jnp.int32),
    )


def fresh_caches(cfg: ModelConfig):
    shape = kv_cache_shape(NUM_BLOCKS, BLOCK_SIZE, cfg.num_kv_heads,
                           cfg.head_dim)
    return [jnp.zeros(shape, jnp.dtype(cfg.dtype))
            for _ in range(cfg.num_layers)]


def test_prefill_logits_match_hf(tiny_llama):
    import torch
    path, hf_model = tiny_llama
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.num_layers == 3 and cfg.num_kv_heads == 2
    params = load_llama_params(path, cfg)

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3, 9, 88, 123, 250, 17,
              33, 64, 5, 211, 190]  # 20 tokens, crosses a block boundary
    T = len(prompt)

    # HF ground truth.
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    meta = make_prefill_meta(T, [3, 5])
    caches = fresh_caches(cfg)
    hidden, caches = llama.forward(params, cfg,
                                   jnp.asarray(prompt, jnp.int32),
                                   jnp.arange(T, dtype=jnp.int32), caches,
                                   meta)
    logits = llama.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_decode_matches_hf_incremental(tiny_llama):
    import torch
    path, hf_model = tiny_llama
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)

    prompt = list(range(1, 13))  # 12 tokens
    decode_tokens = [50, 60, 70, 80, 90, 100]  # 6 decode steps
    full = prompt + decode_tokens
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([full])).logits[0].numpy()

    caches = fresh_caches(cfg)
    block_ids = [2, 4]

    # Prefill.
    meta = make_prefill_meta(len(prompt), block_ids)
    hidden, caches = llama.forward(params, cfg,
                                   jnp.asarray(prompt, jnp.int32),
                                   jnp.arange(len(prompt), dtype=jnp.int32),
                                   caches, meta)
    logits = llama.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits[-1]),
                               hf_logits[len(prompt) - 1],
                               rtol=2e-4, atol=2e-4)

    # Decode one token at a time through the paged cache.
    max_blocks = 8
    bt = np.zeros((1, max_blocks), np.int32)
    bt[0, :2] = block_ids
    for i, tok in enumerate(decode_tokens):
        pos = len(prompt) + i
        slot = block_ids[pos // BLOCK_SIZE] * BLOCK_SIZE + pos % BLOCK_SIZE
        meta = AttentionMetadata(
            slot_mapping=jnp.asarray([slot], jnp.int32),
            block_tables=jnp.asarray(bt),
            query_start_loc=jnp.asarray([0, 1], jnp.int32),
            seq_lens=jnp.asarray([pos + 1], jnp.int32),
        )
        hidden, caches = llama.forward(params, cfg,
                                       jnp.asarray([tok], jnp.int32),
                                       jnp.asarray([pos], jnp.int32),
                                       caches, meta)
        logits = llama.compute_logits(params, cfg, hidden)
        np.testing.assert_allclose(np.asarray(logits[0]), hf_logits[pos],
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"decode step {i}")


def test_ragged_mixed_batch_matches_separate(tiny_llama):
    """Two requests in one ragged batch == each run alone."""
    path, _ = tiny_llama
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)

    p1 = list(range(1, 19))  # 18 tokens
    p2 = list(range(100, 107))  # 7 tokens

    # Run separately.
    outs = []
    for prompt, blocks in ((p1, [3, 6]), (p2, [9])):
        caches = fresh_caches(cfg)
        meta = make_prefill_meta(len(prompt), blocks)
        hidden, _ = llama.forward(params, cfg,
                                  jnp.asarray(prompt, jnp.int32),
                                  jnp.arange(len(prompt), dtype=jnp.int32),
                                  caches, meta)
        outs.append(np.asarray(llama.compute_logits(params, cfg, hidden)))

    # Run as one ragged batch.
    caches = fresh_caches(cfg)
    tokens = p1 + p2
    positions = list(range(len(p1))) + list(range(len(p2)))
    bt = np.zeros((2, 8), np.int32)
    bt[0, :2] = [3, 6]
    bt[1, :1] = [9]
    slots = ([3 * BLOCK_SIZE + i for i in range(16)] +
             [6 * BLOCK_SIZE + i for i in range(2)] +
             [9 * BLOCK_SIZE + i for i in range(7)])
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray(slots, jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, len(p1), len(p1) + len(p2)],
                                    jnp.int32),
        seq_lens=jnp.asarray([len(p1), len(p2)], jnp.int32),
    )
    hidden, _ = llama.forward(params, cfg, jnp.asarray(tokens, jnp.int32),
                              jnp.asarray(positions, jnp.int32), caches,
                              meta)
    logits = np.asarray(llama.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(logits[:len(p1)], outs[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(logits[len(p1):], outs[1], rtol=1e-4,
                               atol=1e-4)
