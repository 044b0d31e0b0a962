"""BERT encoder-only embedder parity vs HF transformers.

Validates the segment-masked bidirectional forward + the engine
pooling path (ref analog: vllm BertEmbeddingModel, tests/models/
language/pooling): hidden states match HF last_hidden_state, and
engine mean/CLS-pooled embeddings match pooling HF's states directly —
including two requests batched into one ragged step.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
    )
    model = BertModel(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_bert"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_bert_hidden_match_hf(tiny_bert):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import bert
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model = tiny_bert
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "BertModel"
    params = load_llama_params(path, cfg)
    assert params["layers"][0]["qkv_proj"]["weight"].shape == (64, 192)

    a = [2, 45, 99, 200, 7, 13]
    b = [42, 77, 150, 3]
    with torch.no_grad():
        hf_a = hf_model(torch.tensor([a])).last_hidden_state[0].numpy()
        hf_b = hf_model(torch.tensor([b])).last_hidden_state[0].numpy()

    # Both requests in ONE ragged step: the segment mask must keep
    # their bidirectional attention separate.
    toks = a + b
    T = len(toks)
    meta = AttentionMetadata(
        slot_mapping=jnp.zeros((T, ), jnp.int32),
        block_tables=jnp.zeros((2, 4), jnp.int32),
        query_start_loc=jnp.asarray([0, len(a), T], jnp.int32),
        seq_lens=jnp.asarray([len(a), len(b)], jnp.int32),
    )
    positions = jnp.asarray(
        list(range(len(a))) + list(range(len(b))), jnp.int32)
    caches = bert.make_caches(cfg, 4, 16, 2, None)
    hidden, _ = bert.forward(params, cfg, jnp.asarray(toks, jnp.int32),
                             positions, caches, meta)
    got = np.asarray(hidden)
    np.testing.assert_allclose(got[:len(a)], hf_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[len(a):], hf_b, rtol=2e-4, atol=2e-4)


def test_bert_engine_embeddings(tiny_bert):
    import torch
    from vllm_tpu import LLM
    from vllm_tpu.sample.params import PoolingParams

    path, hf_model = tiny_bert
    llm = LLM(path, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=64,
              num_kv_blocks=65)
    prompts = [[2, 45, 99, 200, 7, 13], [42, 77, 150, 3]]
    want = []
    with torch.no_grad():
        for p in prompts:
            want.append(hf_model(
                torch.tensor([p])).last_hidden_state[0].numpy())

    outs = llm.embed(prompts, PoolingParams(pooling_type="mean", normalize=False))
    for out, hs in zip(outs, want):
        np.testing.assert_allclose(np.asarray(out.embedding),
                                   hs.mean(axis=0), rtol=2e-4,
                                   atol=2e-4)
    outs = llm.embed(prompts, PoolingParams(pooling_type="cls", normalize=False))
    for out, hs in zip(outs, want):
        np.testing.assert_allclose(np.asarray(out.embedding), hs[0],
                                   rtol=2e-4, atol=2e-4)


def test_roberta_engine_embeddings(tmp_path):
    """Roberta-class (pad-offset learned positions): engine mean
    pooling matches HF last_hidden_state."""
    import torch
    from transformers import RobertaConfig, RobertaModel
    from vllm_tpu import LLM
    from vllm_tpu.sample.params import PoolingParams

    torch.manual_seed(0)
    cfg = RobertaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, pad_token_id=1)
    hf = RobertaModel(cfg).eval().to(torch.float32)
    path = str(tmp_path / "roberta")
    hf.save_pretrained(path, safe_serialization=True)

    llm = LLM(path, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, max_num_batched_tokens=64,
              num_kv_blocks=17)
    assert llm.engine.config.model.architecture == "RobertaModel"
    prompts = [[2, 45, 99, 200, 7, 13], [42, 77, 150, 3]]
    outs = llm.embed(prompts, PoolingParams(pooling_type="mean",
                                            normalize=False))
    with torch.no_grad():
        for p, out in zip(prompts, outs):
            hs = hf(torch.tensor([p])).last_hidden_state[0].numpy()
            np.testing.assert_allclose(np.asarray(out.embedding),
                                       hs.mean(axis=0), rtol=2e-4,
                                       atol=2e-4)
