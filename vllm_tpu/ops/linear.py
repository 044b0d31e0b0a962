"""Linear-layer apply dispatch.

A linear layer is a dict leaf in the param pytree; which keys it holds
determines the kernel (the dict *structure* is static under jit, so the
dispatch costs nothing at runtime):

- ``{"weight": [in, out], "bias"?}``            -> dense MXU matmul
- ``{"qweight", "scales", "qzeros"?}``          -> fused dequant-GEMM
  (group-quant weight-only INT4/INT8; Pallas kernel)

This is the TPU-native analog of the reference's per-layer
``quant_method.apply`` dispatch (ref: vllm/model_executor/layers/
quantization/base_config.py QuantizeMethodBase) and its MPLinearKernel
selection (ref: vllm/model_executor/kernels/linear/MPLinearKernel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Calibration capture (quant/error_comp.py): when set, every dense
# linear reports its input activations — used to build per-leaf
# Hessians for GPTQ-class error-compensated quantization. Only fires
# on EAGER forwards (the calibration pass runs unjitted).
_capture_sink = None


class capture_linear_inputs:
    """Context manager: sink(leaf, x) per dense linear apply."""

    def __init__(self, sink) -> None:
        self._sink = sink

    def __enter__(self):
        global _capture_sink
        self._prev = _capture_sink
        _capture_sink = self._sink
        return self

    def __exit__(self, *exc):
        global _capture_sink
        _capture_sink = self._prev
        return False


def linear(leaf: dict, x: jax.Array) -> jax.Array:
    if "qweight" in leaf:
        from vllm_tpu.quant.kernels import quantized_matmul
        out = quantized_matmul(x, leaf)
    else:
        if _capture_sink is not None and not isinstance(
                x, jax.core.Tracer):
            _capture_sink(leaf, x)
        out = _dense_matmul(x, leaf["weight"])
    if "bias" in leaf:
        out = out + leaf["bias"]
    return out


def _dense_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    # Decode shapes (small leading dim) go through the weight-streaming
    # Pallas matmul — XLA's dense matmul only reaches ~30% of HBM BW
    # there (ops/pallas/matmul.py). Prefill stays on XLA.
    from vllm_tpu.ops.dispatch import attention_backend
    T = x.shape[0] if x.ndim == 2 else None
    K, N = w.shape
    if (attention_backend() == "pallas" and T is not None and T <= 64
            and K % 256 == 0 and N % 256 == 0):
        from vllm_tpu.ops.pallas.matmul import decode_matmul
        return decode_matmul(x, w)
    return jnp.dot(x, w, preferred_element_type=x.dtype)
