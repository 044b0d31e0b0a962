"""GPTQ-class error-compensated 2/3-bit quantization (INC tier; ref
inc.py:37-50 bits {2,3}): the compensated formats must beat plain RTN
by a wide margin on the distilled checkpoint and pass their tightened
gate budgets (VERDICT r4 item 5)."""

import copy
import os

import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                     "tiny_distilled.npz")


def test_ec_rounding_reduces_weight_error():
    """Unit: with a correlated-input Hessian, EC beats RTN on the
    output-space error ||X (W - What)||."""
    from vllm_tpu.quant.error_comp import quantize_groupwise_ec
    rng = np.random.default_rng(0)
    K, N, T = 128, 64, 256
    X = rng.standard_normal((T, K)).astype(np.float32)
    X[:, : K // 2] *= 4.0  # strongly anisotropic inputs
    W = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    H = X.T @ X

    def out_err(q, s, mn, group=64):
        dq = (q.reshape(K // group, group, N) *
              s[:, None] + mn[:, None]).reshape(K, N)
        return float(np.linalg.norm(X @ (W - dq)))

    q, s, mn = quantize_groupwise_ec(W, 2, 64, H)
    # RTN baseline
    wg = W.reshape(K // 64, 64, N)
    mn0 = wg.min(axis=1)
    mx0 = wg.max(axis=1)
    s0 = np.where(mx0 > mn0, (mx0 - mn0) / 3, 1.0)
    q0 = np.clip(np.rint((wg - mn0[:, None]) / s0[:, None]), 0,
                 3).reshape(K, N)
    assert out_err(q, s, mn) < 0.7 * out_err(q0, s0, mn0)


def test_ec_gate_on_distilled():
    from vllm_tpu.evals.corpus import eval_token_ids
    from vllm_tpu.evals.gate import DEFAULT_BUDGETS, quant_ppl_report
    from vllm_tpu.evals.train_tiny import load_npz, model_config
    params = load_npz(ASSET)
    cfg = model_config()
    ids = eval_token_ids(vocab_size=512)[:1024]
    rep = quant_ppl_report(params, cfg, ["int2_ec", "int3_ec"], ids)
    base = rep["baseline"]
    for fmt in ("int2_ec", "int3_ec"):
        delta = (rep[fmt] - base) / base
        assert delta < DEFAULT_BUDGETS[fmt], (fmt, delta)
    # EC must be FAR below the plain-RTN budgets it replaces.
    assert (rep["int2_ec"] - base) / base < 0.3
