"""Fused decode kernel (attention + KV write) vs XLA reference
(interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.ops.attention import ragged_paged_attention_xla
from vllm_tpu.ops.kv_cache import kv_cache_shape, write_kv_xla
from vllm_tpu.ops.pallas.decode_attention import decode_paged_attention


def make_case(rng, ctx_lens, H=8, KH=4, D=64, bs=16, max_blocks=8,
              dtype=jnp.float32):
    """ctx_lens = sequence length INCLUDING the new token; the new
    token's K/V is NOT yet in the cache (the kernel writes it)."""
    R = len(ctx_lens)
    num_blocks = R * max_blocks + 1
    q = jnp.asarray(rng.standard_normal((R, H, D)), dtype)
    new_k = jnp.asarray(rng.standard_normal((R, KH, D)), dtype)
    new_v = jnp.asarray(rng.standard_normal((R, KH, D)), dtype)
    shape = kv_cache_shape(num_blocks, bs, KH, D)
    kv = jnp.zeros(shape, dtype).at[..., :D].set(
        jnp.asarray(rng.standard_normal(shape[:3] + (D,)), dtype))
    bt = np.zeros((R, max_blocks), np.int32)
    sl = np.zeros(R, np.int32)
    nxt = 1
    for i, cl in enumerate(ctx_lens):
        sl[i] = cl
        nblk = -(-max(cl, 1) // bs)
        bt[i, :nblk] = range(nxt, nxt + nblk)
        nxt += nblk
    return q, new_k, new_v, kv, jnp.asarray(bt), jnp.asarray(sl)


def xla_reference(q, new_k, new_v, kv, bt, sl, bs):
    """Write via scatter then attend (the fallback path)."""
    R = q.shape[0]
    pos = jnp.maximum(sl - 1, 0)
    slots = (jnp.take_along_axis(bt, (pos // bs)[:, None],
                                 axis=1)[:, 0] * bs + pos % bs)
    kv2 = write_kv_xla(kv, new_k, new_v, slots)
    qsl = jnp.arange(R + 1, dtype=jnp.int32)
    return ragged_paged_attention_xla(q, kv2, bt, qsl, sl,
                                      sm_scale=0.125), kv2


@pytest.mark.parametrize("ctx_lens", [
    [17],                 # single row
    [16, 1, 33, 120],     # ragged, incl. >RING blocks
    [5, 0, 9],            # inactive row in the middle
    [32, 48],             # block-boundary: new token starts a block
])
def test_fused_matches_xla(ctx_lens):
    rng = np.random.default_rng(0)
    q, nk, nv, kv, bt, sl = make_case(rng, ctx_lens)
    ref_out, ref_kv = xla_reference(q, nk, nv, kv, bt, sl, 16)
    got_out, got_kv = decode_paged_attention(q, nk, nv, kv, bt, sl,
                                             sm_scale=0.125,
                                             interpret=True)
    active = np.asarray(sl) > 0
    np.testing.assert_allclose(np.asarray(got_out)[active],
                               np.asarray(ref_out)[active], rtol=2e-5,
                               atol=2e-5)
    # Cache contents: the written rows must match (compare only blocks
    # of active rows — inactive rows wrote nothing in the kernel).
    bt_np = np.asarray(bt)
    for i, cl in enumerate(ctx_lens):
        if cl == 0:
            continue
        for b in bt_np[i][:max(1, -(-cl // 16))]:
            np.testing.assert_allclose(np.asarray(got_kv[b]),
                                       np.asarray(ref_kv[b]), rtol=2e-5,
                                       atol=2e-5, err_msg=f"block {b}")


def test_gqa_and_mha():
    # (8, 8) one group; (8, 2) GQA; (16, 16) and (32, 32) exercise the
    # multi-head-group grid (n_hg = 2 and 4 at MAX_HG=8) that unblocks
    # MHA models like Llama-2-7B (KH=32).
    for H, KH in [(8, 8), (8, 2), (16, 16), (32, 32)]:
        rng = np.random.default_rng(H + KH)
        q, nk, nv, kv, bt, sl = make_case(rng, [20, 47], H=H, KH=KH)
        ref_out, ref_kv = xla_reference(q, nk, nv, kv, bt, sl, 16)
        got_out, got_kv = decode_paged_attention(q, nk, nv, kv, bt, sl,
                                                 sm_scale=0.125,
                                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got_out),
                                   np.asarray(ref_out), rtol=2e-5,
                                   atol=2e-5, err_msg=f"H={H} KH={KH}")
        # Multi-group fused writes must land in every group's planes.
        bt_np = np.asarray(bt)
        for i, cl in enumerate([20, 47]):
            for b in bt_np[i][:-(-cl // 16)]:
                np.testing.assert_allclose(
                    np.asarray(got_kv[b]), np.asarray(ref_kv[b]),
                    rtol=2e-5, atol=2e-5, err_msg=f"KH={KH} block {b}")


def test_fp8_cache():
    rng = np.random.default_rng(9)
    q, nk, nv, kv, bt, sl = make_case(rng, [20, 47], dtype=jnp.float32)
    kv8 = kv.astype(jnp.float8_e4m3fn)
    ref_out, ref_kv = xla_reference(q, nk, nv, kv8, bt, sl, 16)
    got_out, got_kv = decode_paged_attention(q, nk, nv, kv8, bt, sl,
                                             sm_scale=0.125,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got_out, np.float32),
                               np.asarray(ref_out, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(got_kv.astype(jnp.float32)),
        np.asarray(ref_kv.astype(jnp.float32)))


def test_sliding_window_and_softcap():
    rng = np.random.default_rng(11)
    q, nk, nv, kv, bt, sl = make_case(rng, [40, 90])
    R = 2
    qsl = jnp.arange(R + 1, dtype=jnp.int32)
    for win, cap in [(16, None), (None, 20.0), (24, 30.0)]:
        pos = jnp.maximum(sl - 1, 0)
        slots = (jnp.take_along_axis(bt, (pos // 16)[:, None],
                                     axis=1)[:, 0] * 16 + pos % 16)
        kv2 = write_kv_xla(kv, nk, nv, slots)
        ref = ragged_paged_attention_xla(q, kv2, bt, qsl, sl,
                                         sm_scale=0.125,
                                         sliding_window=win,
                                         logit_softcap=cap)
        got, _ = decode_paged_attention(q, nk, nv, kv, bt, sl,
                                        sm_scale=0.125,
                                        sliding_window=win,
                                        logit_softcap=cap,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"win={win} cap={cap}")
