"""Weight-streaming decode matmul vs XLA (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from vllm_tpu.ops.pallas.matmul import decode_matmul


def test_matches_xla():
    rng = np.random.default_rng(0)
    for T, K, N in [(1, 256, 512), (32, 512, 768), (33, 1024, 256)]:
        x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
        got = np.asarray(decode_matmul(x, w, interpret=True))
        ref = np.asarray(x) @ np.asarray(w)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"{T}x{K}x{N}")
