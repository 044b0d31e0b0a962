"""Cross-encoder scoring parity vs HF BertForSequenceClassification.

Validates the /score family (ref analog: entrypoints/pooling/scoring/
serving.py ServingScores + tests/entrypoints/pooling): the pooler +
classifier head loads from the checkpoint, LLM.score runs the joint
[CLS] a [SEP] b [SEP] forward and matches HF's sigmoid(logit), rerank
orders by that score, and embedding checkpoints fall back to cosine
similarity.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cross_encoder(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertForSequenceClassification
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
        num_labels=1,
    )
    model = BertForSequenceClassification(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_xenc"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def _llm(path):
    from vllm_tpu.engine.llm import LLM
    return LLM(path, dtype="float32", max_model_len=64, block_size=16,
               max_num_seqs=4, num_kv_blocks=32,
               enable_prefix_caching=False)


def test_score_matches_hf(tiny_cross_encoder):
    import torch
    path, hf = tiny_cross_encoder
    llm = _llm(path)
    assert llm._is_cross_encoder()

    q = [7, 42, 99]
    docs = [[13, 55, 200, 8], [4, 9], [100, 101, 102, 103, 104]]
    pairs = [[101] + q + [102] + d + [102] for d in docs]

    with torch.no_grad():
        want = []
        for ids in pairs:
            logit = hf(torch.tensor([ids])).logits[0, 0].item()
            want.append(1.0 / (1.0 + np.exp(-logit)))

    got = llm.score([q] * len(docs), docs)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # rerank returns the same scores, sorted descending.
    rr = llm.rerank(q, docs)
    assert [r["index"] for r in rr] == sorted(
        range(len(docs)), key=lambda i: -want[i])
    assert rr[0]["relevance_score"] == max(got)
    top1 = llm.rerank(q, docs, top_n=1)
    assert len(top1) == 1 and top1[0]["index"] == rr[0]["index"]


def test_classify_matches_hf(tmp_path):
    import torch
    from transformers import BertConfig, BertForSequenceClassification
    torch.manual_seed(1)
    cfg = BertConfig(vocab_size=256, hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128,
                     max_position_embeddings=128, num_labels=3)
    hf = BertForSequenceClassification(cfg).eval().to(torch.float32)
    path = str(tmp_path / "clf")
    hf.save_pretrained(path, safe_serialization=True)
    llm = _llm(path)

    prompts = [[101, 5, 6, 7, 102], [101, 200, 201, 102]]
    with torch.no_grad():
        want = torch.softmax(
            torch.cat([hf(torch.tensor([p])).logits for p in prompts]),
            dim=-1).numpy()
    got = llm.classify(prompts)
    np.testing.assert_allclose(
        np.stack([g["probs"] for g in got]), want, rtol=2e-4,
        atol=2e-5)
    # HF default id2label: LABEL_<i>
    assert got[0]["label"] == f"LABEL_{int(want[0].argmax())}"


def test_embedding_model_score_is_cosine(tmp_path):
    import torch
    from transformers import BertConfig, BertModel
    torch.manual_seed(2)
    cfg = BertConfig(vocab_size=256, hidden_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=128)
    BertModel(cfg).eval().to(torch.float32).save_pretrained(
        str(tmp_path / "emb"), safe_serialization=True)
    llm = _llm(str(tmp_path / "emb"))
    assert not llm._is_cross_encoder()
    a, b = [5, 6, 7, 8], [5, 6, 7, 9]
    (s, ) = llm.score(a, b)
    ea = llm.embed([a])[0].embedding
    eb = llm.embed([b])[0].embedding
    va, vb = np.asarray(ea), np.asarray(eb)
    want = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
    np.testing.assert_allclose(s, want, rtol=1e-5)
