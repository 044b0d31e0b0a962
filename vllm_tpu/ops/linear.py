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


def linear(leaf: dict, x: jax.Array) -> jax.Array:
    if "qweight" in leaf:
        from vllm_tpu.quant.kernels import quantized_matmul
        out = quantized_matmul(x, leaf)
    else:
        out = jnp.dot(x, leaf["weight"],
                      preferred_element_type=x.dtype)
    if "bias" in leaf:
        out = out + leaf["bias"]
    return out
