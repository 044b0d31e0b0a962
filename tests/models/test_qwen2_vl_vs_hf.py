"""Qwen2-VL parity vs HF transformers: mrope position grids, vision
tower features, merged prefill logits, and engine greedy generation.

Ref analog: vllm/model_executor/models/qwen2_vl.py + MRotaryEmbedding
tests; numerics pinned against HF modeling_qwen2_vl.
"""

import numpy as np
import pytest

import jax.numpy as jnp

GRID = (1, 4, 4)  # 16 patches -> 4 merged tokens (merge 2x2)


@pytest.fixture(scope="module")
def tiny_qwen2_vl(tmp_path_factory):
    import torch
    from transformers import (Qwen2VLConfig,
                              Qwen2VLForConditionalGeneration)
    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=4,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            in_channels=3, mlp_ratio=2, hidden_act="quick_gelu"),
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=255, video_token_id=254,
        vision_start_token_id=253, tie_word_embeddings=False,
    )
    model = Qwen2VLForConditionalGeneration(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_qwen2_vl"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def _patches(grid=GRID, seed=0, ps=4, tp=2, c=3):
    rng = np.random.default_rng(seed)
    n = grid[0] * grid[1] * grid[2]
    return rng.standard_normal((n, c * tp * ps * ps)).astype(np.float32)


def test_mrope_positions_match_hf(tiny_qwen2_vl):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.models.qwen2_vl import mrope_positions

    path, hf_model = tiny_qwen2_vl
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.rope_scaling and "mrope_section" in cfg.rope_scaling
    # prompt: text, image (4 merged tokens), text
    prompt = [10, 11, 253] + [255] * 4 + [20, 21, 22]
    want_pos, want_delta = hf_model.model.get_rope_index(
        torch.tensor([prompt]), torch.tensor([list(GRID)]), None,
        attention_mask=torch.ones(1, len(prompt), dtype=torch.long))
    pos3, delta = mrope_positions(prompt, [GRID], cfg)
    np.testing.assert_array_equal(pos3, want_pos[:, 0].numpy())
    assert delta == int(want_delta[0, 0])
    # text-only prompt: plain positions, delta 0
    pos3, delta = mrope_positions([1, 2, 3, 4], [], cfg)
    np.testing.assert_array_equal(
        pos3, np.broadcast_to(np.arange(4), (3, 4)))
    assert delta == 0


def test_vision_tower_matches_hf(tiny_qwen2_vl):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import qwen2_vl

    path, hf_model = tiny_qwen2_vl
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)
    px = _patches(seed=1)
    with torch.no_grad():
        want = hf_model.model.visual(
            torch.tensor(px), grid_thw=torch.tensor([list(GRID)])).numpy()
    got = np.asarray(
        qwen2_vl.encode_images(params, cfg, jnp.asarray(px), [GRID]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_prefill_logits_match_hf(tiny_qwen2_vl):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import qwen2_vl
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_qwen2_vl
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)
    px = _patches(seed=2)

    prefix, suffix = [12, 13, 253], [20, 21, 22, 23]
    prompt = prefix + [255] * 4 + suffix
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(px),
            image_grid_thw=torch.tensor([list(GRID)]),
        ).logits[0].numpy()

    mm_buffer = qwen2_vl.encode_images(params, cfg, jnp.asarray(px),
                                       [GRID])
    mm_rows = np.full(T, -1, np.int32)
    for j in range(4):
        mm_rows[len(prefix) + j] = j
    pos3, _ = qwen2_vl.mrope_positions(prompt, [GRID], cfg)

    caches = [
        jnp.zeros(kv_cache_shape(8, 16, cfg.num_kv_heads, cfg.head_dim),
                  jnp.float32) for _ in range(cfg.num_layers)
    ]
    bt = np.zeros((1, 4), np.int32)
    bt[0, :2] = [2, 3]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray(32 + np.arange(T), jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
    )
    hidden, _ = qwen2_vl.forward(
        params, cfg, jnp.asarray(prompt, jnp.int32),
        jnp.arange(T, dtype=jnp.int32), caches, meta,
        mm_buffer=mm_buffer, mm_rows=jnp.asarray(mm_rows),
        positions3=jnp.asarray(pos3))
    logits = qwen2_vl.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_engine_generate_matches_hf(tiny_qwen2_vl):
    import torch
    from vllm_tpu import LLM, SamplingParams

    path, hf_model = tiny_qwen2_vl
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=65)
    px = _patches(seed=3)
    prompt = [12, 253, 255, 20, 21]  # single image placeholder
    out = llm.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
        multi_modal_data=[{
            "image": px,
            "image_grid_thw": [GRID],
        }])
    got = out[0].outputs[0].token_ids

    expanded = [12, 253] + [255] * 4 + [20, 21]
    want = hf_model.generate(
        input_ids=torch.tensor([expanded]),
        pixel_values=torch.tensor(px),
        image_grid_thw=torch.tensor([list(GRID)]), max_new_tokens=8,
        do_sample=False, pad_token_id=0)[0][len(expanded):].tolist()
    assert got == want
