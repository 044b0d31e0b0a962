"""GPTQ-class error-compensated low-bit quantization (INC tier).

Ref analog: the fork's INC/AutoRound identity — error-compensated
2/3-bit weight quantization (vllm/model_executor/layers/quantization/
inc/ bits {2,3}, inc.py:37-50). Plain RTN at 2-3 bits is lossy to the
point of uselessness (the r4 gate budgeted int2 at 4x ppl); the INC
family recovers it with calibration-aware rounding. This module
implements the OBQ/GPTQ form of that error compensation:

1. A short calibration pass (the distilled corpus by default) runs the
   DENSE model eagerly; ``ops/linear.capture_linear_inputs`` collects
   per-leaf input activations into Hessians H = X^T X. One pass covers
   every linear (the standard one-shot approximation of per-block
   sequential GPTQ).
2. Per leaf, weights quantize input-row by input-row in our [K, N]
   layout; each row's rounding error back-propagates into the
   not-yet-quantized rows through the inverse-Cholesky factor of
   (H + damp*I) — exactly the GPTQ update, vectorized over all N
   output columns at once.
3. Group scale/zero are computed from the COMPENSATED rows when the
   row pointer enters each group, with an MSE-optimal clip-shrink
   sweep (min-max RTN clips too wide at 2-3 bits).

Measured on the distilled checkpoint (tests/evals/test_distilled_gate
conditions): int2 ppl delta drops from ~+300% (RTN) to the gated
budget tier, int3 similarly — see DEFAULT_BUDGETS int2_ec/int3_ec.
"""

from __future__ import annotations

import numpy as np

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


def collect_hessians(params: dict, cfg, token_ids: list[int],
                     block_size: int = 16) -> dict[int, np.ndarray]:
    """Run the dense model over the calibration tokens (eager, via the
    same paged prefill path the ppl eval uses) and return
    {id(leaf['weight']): H [K, K] float32} for every dense linear."""
    from vllm_tpu.evals.ppl import compute_ppl_from_params
    from vllm_tpu.ops.linear import capture_linear_inputs

    hessians: dict[int, np.ndarray] = {}

    def sink(leaf, x) -> None:
        w = leaf["weight"]
        xf = np.asarray(x, np.float32).reshape(-1, w.shape[0])
        h = hessians.get(id(w))
        if h is None:
            hessians[id(w)] = xf.T @ xf
        else:
            h += xf.T @ xf

    with capture_linear_inputs(sink):
        compute_ppl_from_params(params, cfg, token_ids,
                                block_size=block_size)
    return hessians


def _group_scale_mse(rows: np.ndarray, L: int,
                     shrinks=(1.0, 0.9, 0.8, 0.7, 0.6,
                              0.5)) -> tuple[np.ndarray, np.ndarray]:
    """Per-column (scale, min) for one group's rows [gs, N] with an
    MSE-optimal clip sweep over symmetric shrink factors."""
    mn0 = rows.min(axis=0)
    mx0 = rows.max(axis=0)
    best_s = best_mn = None
    best_err = None
    for f in shrinks:
        mn = mn0 * f
        mx = mx0 * f
        s = np.where(mx > mn, (mx - mn) / L, 1.0).astype(np.float32)
        q = np.clip(np.rint((rows - mn) / s), 0, L)
        err = ((q * s + mn - rows)**2).sum(axis=0)
        if best_err is None:
            best_s, best_mn, best_err = s, mn, err
        else:
            better = err < best_err
            best_s = np.where(better, s, best_s)
            best_mn = np.where(better, mn, best_mn)
            best_err = np.minimum(err, best_err)
    return best_s.astype(np.float32), best_mn.astype(np.float32)


def quantize_groupwise_ec(
    w: np.ndarray,  # [K, N] float32 (in x out layout)
    bits: int,
    group: int,
    H: np.ndarray,  # [K, K] calibration Hessian (X^T X)
    damp: float = 0.01,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GPTQ error-compensated group quantization -> (q uint8 [K, N],
    scales [K/g, N], mins [K/g, N]) with w ~= q * s + mn."""
    K, N = w.shape
    assert K % group == 0
    L = (1 << bits) - 1
    W = np.array(w, np.float32)
    Q = np.zeros((K, N), np.uint8)
    scales = np.zeros((K // group, N), np.float32)
    mins = np.zeros((K // group, N), np.float32)

    Hd = np.array(H, np.float64)
    d = np.diag(Hd).copy()
    dead = d <= 0
    Hd[dead, dead] = 1.0
    W[dead.nonzero()[0], :] = 0.0
    Hd[np.arange(K), np.arange(K)] += damp * float(d.mean() or 1.0)
    # inverse-Cholesky factor (upper): the GPTQ propagation operator.
    Hinv = np.linalg.inv(Hd)
    try:
        T = np.linalg.cholesky(Hinv).T  # upper triangular
    except np.linalg.LinAlgError:
        # Degenerate calibration: fall back to uncompensated rounding.
        T = np.eye(K)

    for g in range(K // group):
        lo, hi = g * group, (g + 1) * group
        s, mn = _group_scale_mse(W[lo:hi], L)
        scales[g] = s
        mins[g] = mn
        for j in range(lo, hi):
            q = np.clip(np.rint((W[j] - mn) / s), 0, L)
            Q[j] = q.astype(np.uint8)
            dq = q * s + mn
            err = (W[j] - dq) / T[j, j]
            if j + 1 < K:
                W[j + 1:] -= np.outer(T[j, j + 1:], err)
    return Q, scales, mins
