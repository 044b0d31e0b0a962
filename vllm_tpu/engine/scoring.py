"""Cross-encoder scoring helpers shared by LLM / AsyncLLM / the
OpenAI server (ref analog: vllm/entrypoints/pooling/scoring/serving.py
ServingScores).

A "cross-encoder" checkpoint is one whose param tree carries a
``classifier`` head (and optionally the HF tanh ``pooler``); scoring
runs the [CLS] a [SEP] b [SEP] pair through one joint forward, pools
the CLS vector and applies the head (HF BertForSequenceClassification
semantics). Embedding checkpoints fall back to cosine similarity of
independently pooled vectors.
"""

from __future__ import annotations

import inspect

import numpy as np


def accepts_pair(tok) -> bool:
    """HF-style tokenizers encode (text, text_pair) with the model's
    pair template; thin test tokenizers don't."""
    try:
        sig = inspect.signature(tok.encode)
        return len([p for p in sig.parameters.values()
                    if p.default is p.empty]) >= 2 or \
            "text_pair" in sig.parameters
    except (TypeError, ValueError):
        return False


def pair_ids(tok, hf_config: dict | None, a, b) -> list[int]:
    """Cross-encoder pair sequence [CLS] a [SEP] b [SEP]."""
    if isinstance(a, str) or isinstance(b, str):
        assert tok is not None, "string pair needs a tokenizer"
        if accepts_pair(tok):
            return tok.encode(a, b)
        a = tok.encode(a)
        b = tok.encode(b)
    hf = hf_config or {}
    cls_id = hf.get("cls_token_id", 101)
    sep_id = hf.get("sep_token_id", 102)
    return [cls_id] + list(a) + [sep_id] + list(b) + [sep_id]


def apply_classifier(params: dict, vecs) -> np.ndarray:
    """pooled [N, E] -> logits [N, num_labels] via the optional tanh
    pooler + classifier head."""
    x = np.asarray(vecs, np.float32)
    pooler = params.get("pooler")
    if pooler is not None:
        x = np.tanh(x @ np.asarray(pooler["weight"], np.float32) +
                    np.asarray(pooler["bias"], np.float32))
    clf = params["classifier"]
    return (x @ np.asarray(clf["weight"], np.float32) +
            np.asarray(clf["bias"], np.float32))


def relevance_scores(logits: np.ndarray) -> list[float]:
    """Single-label head: sigmoid; multi-label: positive-class softmax
    probability (HF reranker convention)."""
    if logits.shape[-1] == 1:
        return [float(s) for s in 1.0 / (1.0 + np.exp(-logits[:, 0]))]
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return [float(s) for s in p[:, -1]]


def softmax_probs(logits: np.ndarray) -> np.ndarray:
    p = np.exp(logits - logits.max(-1, keepdims=True))
    return p / p.sum(-1, keepdims=True)


def cosine(a, b) -> float:
    va = np.asarray(a, np.float32)
    vb = np.asarray(b, np.float32)
    denom = float(np.linalg.norm(va) * np.linalg.norm(vb)) or 1.0
    return float(va @ vb / denom)


def broadcast_pairs(text_1, text_2) -> tuple[list, list]:
    """Reference score semantics: 1xN, Nx1 or NxN elementwise."""
    def aslist(t):
        if not isinstance(t, list) or (t and isinstance(t[0], int)):
            return [t]
        return t

    l1, l2 = aslist(text_1), aslist(text_2)
    if len(l1) == 1 and len(l2) > 1:
        l1 = l1 * len(l2)
    elif len(l2) == 1 and len(l1) > 1:
        l2 = l2 * len(l1)
    if len(l1) != len(l2):
        raise ValueError("text_1/text_2 shapes do not align")
    return l1, l2
