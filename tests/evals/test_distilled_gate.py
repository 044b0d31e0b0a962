"""Accuracy gate on the committed distilled (non-random) checkpoint.

Ref analog: .buildkite/lm-eval-harness/test_lm_eval_correctness.py —
the reference pins per-(model, quant) accuracy in CI. Random weights
say nothing about quantization error, so tests/assets/
tiny_distilled.npz is a byte-level llama trained on this repository's
own sources (vllm_tpu/evals/train_tiny.py, val ppl ~3.2 on held-out
repo text); the per-format ppl deltas measured here are real
quantization-error signal on real weight/activation distributions.

Pinned from the committed checkpoint (2026-08, TPU-trained, 2.8M
params, eval = the held-out EVAL_TEXT prose):
    baseline 10.997 | int8 +0.03% | fp8 -1.10% | int4(g128) +9.62%
Budgets are evals/gate.DEFAULT_BUDGETS; tiny models quantize
*relatively* worse than 7B-class ones, so the int4 number is the
conservative end of the scale.
"""

import os

import pytest

ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                     "tiny_distilled.npz")


@pytest.fixture(scope="module")
def report():
    from vllm_tpu.evals.corpus import eval_token_ids
    from vllm_tpu.evals.gate import quant_ppl_report
    from vllm_tpu.evals.train_tiny import load_npz, model_config
    params = load_npz(ASSET)
    cfg = model_config()
    ids = eval_token_ids(vocab_size=512)[:1024]
    return quant_ppl_report(params, cfg, ["int8", "fp8", "int4"], ids)


def test_checkpoint_is_trained(report):
    # A random 512-vocab model sits at ppl ~512; the distilled one
    # must carry real signal.
    assert report["baseline"] < 30.0


def test_gate_passes_on_real_weights(report):
    from vllm_tpu.evals.gate import assert_gate
    assert_gate(report)


def test_deltas_are_signal_not_noise(report):
    """8-bit formats must be near-lossless while int4 costs something
    measurable — the ordering a real model exhibits (random weights
    show ~0 everywhere)."""
    base = report["baseline"]
    assert abs(report["int8"] - base) / base < 0.02
    assert report["int4"] > base  # 4-bit error is real and positive
    assert (report["int4"] - base) / base < 0.12
