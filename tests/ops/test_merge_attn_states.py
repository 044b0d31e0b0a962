"""merge_attn_states: chunked attention + LSE merge == full attention
(the cascade / decode-context-parallel building block)."""

import numpy as np

import jax.numpy as jnp

from vllm_tpu.ops.attention import (chunk_attention_with_lse,
                                    merge_attn_states)


def _full_attention(q, k, v, sm_scale):
    T, H, D = q.shape
    KH = k.shape[2]
    G = H // KH
    qg = (q * sm_scale).reshape(T, KH, G, D)
    scores = np.einsum("tkgd,tskd->tkgs", qg, k)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("tkgs,tskd->tkgd", p, v)
    return out.reshape(T, H, D)


def test_chunked_merge_matches_full():
    rng = np.random.default_rng(0)
    T, H, KH, D, S = 6, 8, 4, 16, 24
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((T, S, KH, D)).astype(np.float32)
    v = rng.standard_normal((T, S, KH, D)).astype(np.float32)
    scale = D**-0.5

    ref = _full_attention(q, k, v, scale)

    # Split the keys into 3 uneven chunks; chunk 3 has an empty row.
    bounds = [(0, 10), (10, 17), (17, 24)]
    outs, lses = [], []
    for lo, hi in bounds:
        valid = np.ones((T, hi - lo), bool)
        if (lo, hi) == bounds[2]:
            valid[0, :] = False  # row 0 contributes nothing here
        o, l = chunk_attention_with_lse(jnp.asarray(q),
                                        jnp.asarray(k[:, lo:hi]),
                                        jnp.asarray(v[:, lo:hi]),
                                        jnp.asarray(valid),
                                        sm_scale=scale)
        outs.append(np.asarray(o))
        lses.append(np.asarray(l))

    # Row 0's reference must also exclude chunk-3 keys.
    k0 = k.copy()
    ref_row0 = _full_attention(q[0:1], k[0:1, :17], v[0:1, :17], scale)
    ref[0] = ref_row0[0]

    merged = np.asarray(
        merge_attn_states(jnp.asarray(np.stack(outs)),
                          jnp.asarray(np.stack(lses))))
    np.testing.assert_allclose(merged, ref, rtol=2e-5, atol=2e-5)


def test_merge_single_chunk_identity():
    rng = np.random.default_rng(1)
    T, H, D = 4, 2, 8
    out = rng.standard_normal((1, T, H, D)).astype(np.float32)
    lse = rng.standard_normal((1, T, H)).astype(np.float32)
    got = np.asarray(merge_attn_states(jnp.asarray(out),
                                       jnp.asarray(lse)))
    np.testing.assert_allclose(got, out[0], rtol=1e-6)
