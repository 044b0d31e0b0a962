"""Mixtral (MoE) parity vs HF transformers + MoE op unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.ops.moe import fused_moe_apply, topk_softmax_routing


class TestMoEOps:

    def test_topk_routing_weights_sum_to_one(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
        w, idx = topk_softmax_routing(logits, 2)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
        assert idx.shape == (6, 2)
        # top-1 expert has the max logit
        np.testing.assert_array_equal(
            np.asarray(idx)[:, 0], np.asarray(jnp.argmax(logits, -1)))

    def test_fused_moe_matches_dense_loop(self):
        """Grouped-GEMM MoE == naive per-token expert loop."""
        rng = np.random.default_rng(1)
        T, H, I, E, K = 10, 32, 48, 4, 2
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        router = {"weight": jnp.asarray(rng.standard_normal((H, E)),
                                        jnp.float32)}
        wgu = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                          jnp.float32)
        wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1,
                         jnp.float32)
        got = np.asarray(fused_moe_apply(x, router, wgu, wd, K))

        # Naive reference.
        logits = np.asarray(x @ router["weight"])
        ref = np.zeros((T, H), np.float32)
        for t in range(T):
            top = np.argsort(logits[t])[::-1][:K]
            ws = np.exp(logits[t][top] - logits[t][top].max())
            ws = ws / ws.sum()
            for w_, e in zip(ws, top):
                h = np.asarray(x[t]) @ np.asarray(wgu[e])
                gate, up = h[:I], h[I:]
                act = gate / (1 + np.exp(-gate)) * up
                ref[t] += w_ * (act @ np.asarray(wd[e]))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_mixtral(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    torch.manual_seed(0)
    cfg = MixtralConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = MixtralForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_mixtral"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_mixtral_prefill_logits_match_hf(tiny_mixtral):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import mixtral
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_mixtral
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "MixtralForCausalLM"
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params = load_llama_params(path, cfg)
    assert params["layers"][0]["w_gate_up"].shape == (4, 64, 192)

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
    hidden, _ = mixtral.forward(params, cfg, jnp.asarray(prompt, jnp.int32),
                                jnp.arange(T, dtype=jnp.int32), caches,
                                meta)
    logits = mixtral.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-4,
                               atol=5e-4)


def test_mixtral_engine_generate(tiny_mixtral):
    path, hf_model = tiny_mixtral
    import torch
    from vllm_tpu import LLM, SamplingParams
    llm = LLM(path, dtype="float32", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=256, num_kv_blocks=65)
    prompt = [1, 22, 33, 44]
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    got = out[0].outputs[0].token_ids
    want = hf_model.generate(torch.tensor([prompt]), max_new_tokens=8,
                             do_sample=False,
                             pad_token_id=0)[0][len(prompt):].tolist()
    assert got == want
