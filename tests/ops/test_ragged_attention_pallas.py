"""Pallas ragged paged attention vs the XLA reference (interpret mode
on CPU; the same kernel compiles on TPU).

Ref analog: tests/kernels/attention in the reference (Triton/CUDA
kernels vs torch reference).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.ops.attention import ragged_paged_attention_xla
from vllm_tpu.ops.pallas.ragged_attention import ragged_paged_attention


def make_case(
    rng,
    q_lens: list[int],
    ctx_lens: list[int],
    H=8,
    KH=4,
    D=64,
    block_size=16,
    max_blocks=8,
    R=None,
    dtype=jnp.float32,
    q_blk=16,
):
    """Build a random ragged batch. seq_len = ctx + q_len per request."""
    R = R or len(q_lens)
    num_blocks = R * max_blocks + 1
    T = sum(q_lens)
    T_slack = T + q_blk
    q = jnp.asarray(rng.standard_normal((T_slack, H, D)), dtype)
    from vllm_tpu.ops.kv_cache import kv_cache_shape
    kv_shape = kv_cache_shape(num_blocks, block_size, KH, D)
    kv = jnp.zeros(kv_shape, dtype)
    kv = kv.at[..., :D].set(
        jnp.asarray(rng.standard_normal(kv_shape[:3] + (D, )), dtype))

    bt = np.zeros((R, max_blocks), np.int32)
    qsl = np.zeros(R + 1, np.int32)
    seq_lens = np.zeros(R, np.int32)
    nxt = 1
    for i, (ql, cl) in enumerate(zip(q_lens, ctx_lens)):
        seq_lens[i] = ql + cl
        qsl[i + 1] = qsl[i] + ql
        nblk = -(-(ql + cl) // block_size)
        bt[i, :nblk] = range(nxt, nxt + nblk)
        nxt += nblk
    qsl[len(q_lens) + 1:] = qsl[len(q_lens)]
    return (q, kv, jnp.asarray(bt), jnp.asarray(qsl),
            jnp.asarray(seq_lens))


def run_both(case, sm_scale=0.125, q_blk=16, f_blocks=2, **kw):
    q, kv, bt, qsl, seq_lens = case
    T = int(qsl[-1])
    ref = ragged_paged_attention_xla(q[:T], kv, bt, qsl, seq_lens,
                                     sm_scale=sm_scale, **kw)
    got = ragged_paged_attention(q, kv, bt, qsl, seq_lens,
                                 sm_scale=sm_scale, q_blk=q_blk,
                                 f_blocks=f_blocks, interpret=True,
                                 **kw)[:T]
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize("q_lens,ctx_lens", [
    ([1], [16]),                      # single decode
    ([1, 1, 1], [5, 33, 17]),         # decode batch, ragged contexts
    ([20], [0]),                      # pure prefill, >1 chunk
    ([7, 1, 30, 1], [9, 40, 0, 3]),   # mixed prefill+decode
    ([16, 16], [16, 48]),             # block-aligned
])
def test_matches_xla_reference(q_lens, ctx_lens):
    rng = np.random.default_rng(0)
    case = make_case(rng, q_lens, ctx_lens)
    ref, got = run_both(case)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_padding_rows_inactive():
    """Rows beyond the active requests (qsl flat) are skipped."""
    rng = np.random.default_rng(1)
    case = make_case(rng, [4, 6], [10, 2], R=5)
    ref, got = run_both(case)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_sliding_window():
    rng = np.random.default_rng(2)
    case = make_case(rng, [12, 1], [20, 40])
    ref, got = run_both(case, sliding_window=8)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_logit_softcap():
    rng = np.random.default_rng(3)
    case = make_case(rng, [5, 1], [7, 21])
    ref, got = run_both(case, logit_softcap=30.0)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_gqa_ratios():
    for H, KH in [(8, 8), (8, 2), (4, 1)]:
        rng = np.random.default_rng(H * 10 + KH)
        case = make_case(rng, [3, 9], [14, 6], H=H, KH=KH)
        ref, got = run_both(case)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"H={H} KH={KH}")


def test_long_context_multi_superblock():
    rng = np.random.default_rng(4)
    # context spans > F*block_size so the flash loop runs multiple
    # double-buffered iterations.
    case = make_case(rng, [1, 2], [100, 70], max_blocks=8)
    ref, got = run_both(case, f_blocks=2)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_bf16():
    rng = np.random.default_rng(5)
    case = make_case(rng, [4, 1], [12, 30], dtype=jnp.bfloat16)
    ref, got = run_both(case)
    np.testing.assert_allclose(got.astype(np.float32),
                               ref.astype(np.float32), rtol=2e-2,
                               atol=2e-2)


def test_return_lse_matches_xla():
    """LSE output parity (the CP partial contract, VERDICT r2 item 5)."""
    rng = np.random.default_rng(5)
    case = make_case(rng, [1, 4, 1], [17, 8, 33])
    q, kv, bt, qsl, seq_lens = case
    T = int(qsl[-1])
    ref, ref_lse = ragged_paged_attention_xla(
        q[:T], kv, bt, qsl, seq_lens, sm_scale=0.125, return_lse=True)
    got, got_lse = ragged_paged_attention(
        q, kv, bt, qsl, seq_lens, sm_scale=0.125, q_blk=16, f_blocks=2,
        interpret=True, return_lse=True)
    np.testing.assert_allclose(np.asarray(got[:T]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_lse[:T]),
                               np.asarray(ref_lse), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("offset", [0, 1])
def test_chunk_stride_matches_xla(offset):
    """Strided chunk positions (CP interleaved KV layout): the local
    table's slot i covers global chunk i*stride + offset; out AND lse
    must match the XLA reference with identical stride semantics."""
    rng = np.random.default_rng(6 + offset)
    case = make_case(rng, [1, 2, 1], [40, 12, 70], max_blocks=8)
    q, kv, bt, qsl, seq_lens = case
    T = int(qsl[-1])
    ref, ref_lse = ragged_paged_attention_xla(
        q[:T], kv, bt, qsl, seq_lens, sm_scale=0.125,
        chunk_stride=2, chunk_offset=offset, return_lse=True)
    got, got_lse = ragged_paged_attention(
        q, kv, bt, qsl, seq_lens, sm_scale=0.125, q_blk=16,
        f_blocks=2, interpret=True, chunk_stride=2,
        chunk_offset=offset, return_lse=True)
    np.testing.assert_allclose(np.asarray(got[:T]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_lse[:T]),
                               np.asarray(ref_lse), rtol=2e-5,
                               atol=2e-5)


def test_quant_chunk_stride_lse():
    """Quantized-KV variant of the strided/LSE contract (int8
    per-token-head cache through _qkernel)."""
    from vllm_tpu.ops.kv_cache import make_kv_cache, write_kv_xla
    rng = np.random.default_rng(9)
    H, KH, D, bs = 8, 4, 64, 16
    T_ctx = 60
    k = jnp.asarray(rng.standard_normal((T_ctx, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T_ctx, KH, D)), jnp.float32)
    cache = write_kv_xla(make_kv_cache(8, bs, KH, D, "int8", "float32"),
                         k, v, jnp.arange(T_ctx, dtype=jnp.int32))
    q_blk = 8
    q = jnp.asarray(rng.standard_normal((2 + q_blk, H, D)), jnp.float32)
    bt = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    qsl = jnp.asarray([0, 2], jnp.int32)
    sl = jnp.asarray([T_ctx], jnp.int32)
    ref, ref_lse = ragged_paged_attention_xla(
        q[:2], cache, bt, qsl, sl, sm_scale=0.125, chunk_stride=2,
        chunk_offset=1, return_lse=True)
    got, got_lse = ragged_paged_attention(
        q, cache, bt, qsl, sl, sm_scale=0.125, q_blk=q_blk, f_blocks=2,
        interpret=True, chunk_stride=2, chunk_offset=1,
        return_lse=True)
    np.testing.assert_allclose(np.asarray(got[:2]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_lse[:2]),
                               np.asarray(ref_lse), rtol=2e-5,
                               atol=2e-5)
