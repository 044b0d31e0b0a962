"""Executable accuracy gate: pinned ppl deltas per quant format.

Ref analog: .buildkite/lm-eval-harness/test_lm_eval_correctness.py —
the reference pins a GSM8K exact-match score per (model, quant) YAML
and fails CI on regression. Here the pin is teacher-forced perplexity
through the real serving stack (evals/ppl.py) on the in-repo corpus
(evals/corpus.py): for every quant format, ppl(quant) - ppl(bf16) must
stay within the pinned budget. BASELINE.md's north-star gate is
ppl delta <= 0.5 at INT4-g128 on a real checkpoint; the same machinery
runs today on the shipped tiny checkpoints and in bench.py
(VLLM_TPU_BENCH_PPL=1).
"""

from __future__ import annotations

from typing import Optional

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

# Default per-format ppl-delta budgets (fraction of baseline ppl) for
# weight-only / weight+activation formats, mirroring the reference's
# per-quant tolerance tiers (lm-eval configs allow ~0.02 absolute on
# exact-match; ppl is more sensitive, budgets are relative).
DEFAULT_BUDGETS = {
    "int8": 0.02,      # W8A16 — near-lossless
    "fp8": 0.02,       # W8A16 fp8
    "w8a8_int8": 0.05,
    "mxfp8": 0.03,
    "int4": 0.10,      # W4A16 g128
    "w4a8": 0.12,      # QQQ-class W4A8 (int4 weights + int8 per-token
    #                  activations; the delta over int4 is the
    #                  activation-quant cost, measured ~+1% distilled)
    "mxfp4": 0.25,
    "nf4": 0.12,       # bnb-class NF4 codebook (block-64 absmax)
    "int3": 0.40,      # W3A16 g64 plain RTN (ref inc bits=3 tier)
    "int2": 4.00,      # W2A16 g64 plain RTN — decorative without EC
    # INC tier: GPTQ-class error-compensated rounding over a short
    # calibration pass (quant/error_comp.py). Measured on the
    # distilled ckpt with DISJOINT calibration: int2 -3.7%, int3
    # -5.6% (vs RTN +258% / +26%) — budgets leave margin for
    # less-friendly weight distributions.
    "int2_ec": 0.30,
    "int3_ec": 0.15,
}


def quant_ppl_report(
    params: dict,
    cfg,
    formats: list[str],
    token_ids: Optional[list[int]] = None,
    *,
    block_size: int = 16,
) -> dict[str, float]:
    """ppl per format (plus 'baseline') on the given token ids (default:
    the in-repo corpus). Quantization happens online from the given
    dense params; every number runs through the paged serving path."""
    import copy

    import jax.numpy as jnp

    from vllm_tpu.evals.corpus import eval_token_ids
    from vllm_tpu.evals.ppl import compute_ppl_from_params
    from vllm_tpu.quant.online import quantize_params_online

    if token_ids is None:
        token_ids = eval_token_ids(vocab_size=cfg.vocab_size)
    report = {
        "baseline": compute_ppl_from_params(params, cfg, token_ids,
                                            block_size=block_size)
    }
    for fmt in formats:
        qp = {
            "layers": [dict(la) for la in copy.deepcopy(params["layers"])],
            **{k: v for k, v in params.items() if k != "layers"},
        }
        if fmt.endswith("_ec"):
            # Error-compensated tier: calibrate on a corpus span
            # DISJOINT from the eval tokens (quant/error_comp.py).
            calib = eval_token_ids(vocab_size=cfg.vocab_size,
                                   max_tokens=100_000)
            calib = [t for t in calib][len(token_ids):
                                       len(token_ids) + 768]
            qp = quantize_params_online(qp, fmt[:-3], cfg=cfg,
                                        calib_ids=calib)
        else:
            qp = quantize_params_online(qp, fmt)
        report[fmt] = compute_ppl_from_params(qp, cfg, token_ids,
                                              block_size=block_size)
        del qp
    return report


def assert_gate(report: dict[str, float],
                budgets: Optional[dict[str, float]] = None) -> None:
    """Raises AssertionError when any format's relative ppl delta
    exceeds its budget (the CI gate)."""
    budgets = budgets or DEFAULT_BUDGETS
    base = report["baseline"]
    failures = []
    for fmt, ppl in report.items():
        if fmt == "baseline":
            continue
        budget = budgets.get(fmt)
        if budget is None:
            continue
        delta = (ppl - base) / base
        logger.info("accuracy gate %s: ppl %.4f (baseline %.4f, "
                    "delta %+.2f%%, budget %.0f%%)", fmt, ppl, base,
                    100 * delta, 100 * budget)
        if delta > budget:
            failures.append(f"{fmt}: ppl {ppl:.4f} vs baseline "
                            f"{base:.4f} (+{100*delta:.2f}% > "
                            f"{100*budget:.0f}%)")
    assert not failures, "accuracy gate failed:\n" + "\n".join(failures)
