"""DeepSeek-V2/V3 (MLA + grouped-routing MoE) parity vs HF transformers.

Also validates the absorbed-MQA MLA identity: the engine's latent-cache
attention must reproduce HF's decompressed-MHA logits exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_deepseek_v2(tmp_path_factory):
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    torch.manual_seed(0)
    cfg = DeepseekV2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_routed_experts=8,
        n_shared_experts=2,
        num_experts_per_tok=2,
        first_k_dense_replace=1,
        topk_method="group_limited_greedy",
        n_group=2,
        topk_group=1,
        routed_scaling_factor=1.0,
        q_lora_rank=32,
        kv_lora_rank=64,
        qk_nope_head_dim=32,
        qk_rope_head_dim=16,
        v_head_dim=32,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = DeepseekV2ForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_dsv2"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_deepseek_prefill_logits_match_hf(tiny_deepseek_v2):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import deepseek
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_deepseek_v2
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "DeepseekV2ForCausalLM"
    assert cfg.kv_lora_rank == 64 and cfg.qk_rope_head_dim == 16
    assert cfg.num_kv_heads == 1 and cfg.head_dim == 80  # latent MQA
    params = load_llama_params(path, cfg)
    l0, l1 = params["layers"][0], params["layers"][1]
    assert "gate_up_proj" in l0 and "router" not in l0  # dense first-k
    assert "router" in l1 and l1["w_gate_up"].shape == (8, 64, 96)
    assert "gate_up_proj" in l1  # shared experts

    prompt = [1, 45, 99, 200, 7, 13, 42, 77, 150, 3]
    T = len(prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    caches = [
        jnp.zeros(kv_cache_shape(8, 16, cfg.num_kv_heads, cfg.head_dim),
                  jnp.float32) for _ in range(cfg.num_layers)
    ]
    bt = np.zeros((1, 4), np.int32)
    bt[0, :1] = [2]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
    )
    hidden, _ = deepseek.forward(params, cfg,
                                 jnp.asarray(prompt, jnp.int32),
                                 jnp.arange(T, dtype=jnp.int32), caches,
                                 meta)
    logits = deepseek.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_deepseek_engine_generate(tiny_deepseek_v2):
    path, hf_model = tiny_deepseek_v2
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=256,
              num_kv_blocks=65)
    prompt = [1, 22, 33, 44]
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    got = out[0].outputs[0].token_ids
    want = hf_model.generate(torch.tensor([prompt]), max_new_tokens=8,
                             do_sample=False,
                             pad_token_id=0)[0][len(prompt):].tolist()
    assert got == want


def test_deepseek_v3_routing():
    """noaux_tc (sigmoid + correction bias) routing matches the HF
    DeepseekV3TopkRouter reference formula."""
    import torch
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.deepseek import _route

    rng = np.random.default_rng(0)
    T, E, H = 16, 8, 32
    cfg = ModelConfig(hidden_size=H, num_heads=2, num_kv_heads=2,
                      num_experts=E, num_experts_per_tok=2,
                      topk_method="noaux_tc", n_group=2, topk_group=1,
                      routed_scaling_factor=2.5, norm_topk_prob=True,
                      kv_lora_rank=16, qk_nope_head_dim=8,
                      qk_rope_head_dim=8, v_head_dim=8)
    x = rng.standard_normal((T, H)).astype(np.float32)
    w = rng.standard_normal((H, E)).astype(np.float32) * 0.3
    bias = rng.standard_normal(E).astype(np.float32) * 0.1
    router = {"weight": jnp.asarray(w),
              "e_score_correction_bias": jnp.asarray(bias)}
    weights, ids = _route(cfg, router, jnp.asarray(x))

    # HF reference formula.
    logits = torch.tensor(x) @ torch.tensor(w)
    scores = logits.sigmoid()
    choice = scores + torch.tensor(bias)
    group_scores = choice.view(T, 2, E // 2).topk(2, dim=-1)[0].sum(-1)
    gidx = torch.topk(group_scores, k=1, dim=-1, sorted=False)[1]
    gmask = torch.zeros_like(group_scores).scatter_(1, gidx, 1)
    mask = gmask.unsqueeze(-1).expand(T, 2, E // 2).reshape(T, E)
    masked = choice.masked_fill(~mask.bool(), 0.0)
    ref_ids = torch.topk(masked, k=2, dim=-1)[1]
    ref_w = scores.gather(1, ref_ids)
    ref_w = ref_w / (ref_w.sum(-1, keepdim=True) + 1e-20) * 2.5

    assert set(map(tuple, np.sort(np.asarray(ids), -1).tolist())) == \
        set(map(tuple, np.sort(ref_ids.numpy(), -1).tolist()))
    np.testing.assert_allclose(
        np.sort(np.asarray(weights), -1), np.sort(ref_w.numpy(), -1),
        rtol=1e-5, atol=1e-6)
