"""Chunked WY-form GDN prefill vs the exact per-token scan.

Ref analog: the fla chunk_gated_delta_rule kernels the reference
wraps (gdn_attn backend) vs its torch recurrent fallback. The chunked
path (ops/gdn.py _chunked_delta) must match the sequential scan to
float tolerance over ragged streams: multi-request chunks, segments
spanning chunk boundaries, cross-engine-step state carry, fresh
(position-0) resets on reused rows, and padding tails.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.qwen3_next import random_params
from vllm_tpu.ops.gdn import GDNState, gdn_mixer, make_gdn_state


def _cfg():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=16,
        max_model_len=512, dtype="float32",
        architecture="Qwen3NextForCausalLM",
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        gdn=dict(num_v_heads=4, num_k_heads=2, head_k_dim=16,
                 head_v_dim=16, conv_kernel=4))
    cfg.layer_types = ("linear_attention", )
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    layer = random_params(cfg, seed=3)["layers"][0]
    return cfg, layer


def _run(cfg, layer, x, pos, state, row_of, chunked):
    return gdn_mixer(cfg, layer, jnp.asarray(x, jnp.float32),
                     jnp.asarray(pos, jnp.int32), state,
                     jnp.asarray(row_of, jnp.int32), decode_rows=False,
                     few_segments=chunked)


def _check(cfg, layer, x, pos, row_of, R=4, state=None):
    st = state if state is not None else make_gdn_state(
        R, cfg, jnp.float32)
    ref_o, ref_st = _run(cfg, layer, x, pos, st, row_of, False)
    got_o, got_st = _run(cfg, layer, x, pos, st, row_of, True)
    # Padding tokens (row >= R) carry garbage in BOTH paths and are
    # dropped by the runner — the scan zeroes them per token (every
    # padding position is 0) while the chunked path chains them as
    # one segment; compare real tokens only.
    real = np.asarray(row_of) < R
    np.testing.assert_allclose(np.asarray(got_o)[real],
                               np.asarray(ref_o)[real],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_st.s),
                               np.asarray(ref_st.s), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_st.conv),
                               np.asarray(ref_st.conv), rtol=1e-5,
                               atol=1e-5)
    return got_st


def test_single_request_multi_chunk(setup):
    cfg, layer = setup
    rng = np.random.default_rng(0)
    T = 128  # 2 chunks of 64
    x = rng.standard_normal((T, 64)).astype(np.float32)
    _check(cfg, layer, x, np.arange(T), np.zeros(T, np.int32))


def test_multi_request_ragged_chunk(setup):
    """Three requests + padding tail share chunks; segments cross
    chunk boundaries."""
    cfg, layer = setup
    rng = np.random.default_rng(1)
    T = 192  # 3 chunks of 64
    lens = [70, 50, 40]  # + 32 padding
    row_of = np.concatenate([np.full(n, i, np.int32)
                             for i, n in enumerate(lens)] +
                            [np.full(32, 4, np.int32)])  # pad row = R
    pos = np.concatenate([np.arange(n) for n in lens] +
                         [np.zeros(32, np.int64)])
    x = rng.standard_normal((T, 64)).astype(np.float32)
    _check(cfg, layer, x, pos, row_of)


def test_cross_step_carry_and_reset(setup):
    """Step 1 seeds rows 0/1; step 2 continues row 0 mid-sequence,
    REUSES row 1 for a fresh (position-0) request, and adds row 2."""
    cfg, layer = setup
    rng = np.random.default_rng(2)
    # Step 1: rows 0 (30 toks) and 1 (18 toks) + padding to 64.
    row1 = np.concatenate([np.zeros(30, np.int32),
                           np.full(18, 1, np.int32),
                           np.full(16, 4, np.int32)])
    pos1 = np.concatenate([np.arange(30), np.arange(18),
                           np.zeros(16, np.int64)])
    x1 = rng.standard_normal((64, 64)).astype(np.float32)
    st = _check(cfg, layer, x1, pos1, row1)
    # Step 2: row 0 continues at position 30; row 1 fresh at 0;
    # row 2 fresh.
    row2 = np.concatenate([np.zeros(20, np.int32),
                           np.full(25, 1, np.int32),
                           np.full(15, 2, np.int32),
                           np.full(4, 4, np.int32)])
    pos2 = np.concatenate([np.arange(30, 50), np.arange(25),
                           np.arange(15), np.zeros(4, np.int64)])
    x2 = rng.standard_normal((64, 64)).astype(np.float32)
    _check(cfg, layer, x2, pos2, row2, state=st)


def test_small_chunk_sizes(setup):
    """T that only chunks at 16/32 still routes and matches."""
    cfg, layer = setup
    rng = np.random.default_rng(4)
    for T in (32, 48):
        x = rng.standard_normal((T, 64)).astype(np.float32)
        _check(cfg, layer, x, np.arange(T), np.zeros(T, np.int32))
