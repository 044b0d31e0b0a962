"""LLaVA (VLM) parity vs HF transformers: vision tower features,
merged-embedding prefill logits, and engine greedy generation with a
real image input end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    torch.manual_seed(0)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=3, num_attention_heads=4,
                          image_size=32, patch_size=8,
                          projection_dim=32)
    tc = LlamaConfig(vocab_size=256, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     max_position_embeddings=256)
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      image_token_index=255,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    model = LlavaForConditionalGeneration(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_llava"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def _pixels(n=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, 32, 32)).astype(np.float32)


def test_vision_tower_matches_hf(tiny_llava):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import llava

    path, hf_model = tiny_llava
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.vision["num_layers"] == 3 and cfg.image_token_index == 255
    assert llava.num_patches(cfg) == 16
    params = load_llama_params(path, cfg)

    px = _pixels()
    with torch.no_grad():
        feats = hf_model.get_image_features(torch.tensor(px))
    if isinstance(feats, (list, tuple)):
        feats = feats[0]
    got = np.asarray(llava.encode_images(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got[0], feats.reshape(16, -1).numpy(),
                               rtol=2e-4, atol=2e-4)


def test_llava_prefill_logits_match_hf(tiny_llava):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import llava
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_llava
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)
    px = _pixels(seed=1)

    # prompt with the image expanded to 16 patch tokens
    prefix, suffix = [1, 12, 13], [20, 21, 22, 23]
    prompt = prefix + [255] * 16 + suffix
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(px),
        ).logits[0].numpy()

    embeds = llava.encode_images(params, cfg, jnp.asarray(px))
    mm_buffer = embeds.reshape(-1, cfg.hidden_size)
    mm_rows = np.full(T, -1, np.int32)
    for j in range(16):
        mm_rows[len(prefix) + j] = j

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
    hidden, _ = llava.forward(params, cfg, jnp.asarray(prompt, jnp.int32),
                              jnp.arange(T, dtype=jnp.int32), caches,
                              meta, mm_buffer=mm_buffer,
                              mm_rows=jnp.asarray(mm_rows))
    logits = llava.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_llava_engine_generate(tiny_llava):
    path, hf_model = tiny_llava
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=65)
    px = _pixels(seed=2)
    prompt = [1, 12, 255, 20, 21]  # single image placeholder
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True),
                       multi_modal_data=[{"image": px}])
    got = out[0].outputs[0].token_ids

    expanded = [1, 12] + [255] * 16 + [20, 21]
    want = hf_model.generate(
        input_ids=torch.tensor([expanded]),
        pixel_values=torch.tensor(px), max_new_tokens=8,
        do_sample=False, pad_token_id=0)[0][len(expanded):].tolist()
    assert got == want
