"""Chunked SSD prefill vs the exact per-token scan (ops/mamba.py).

Ref analog: the reference's mamba2 chunk-scan kernels
(csrc/libtorch_stable/mamba/, vllm/v1/attention/backends/
mamba2_attn.py) are validated against the sequential selective-scan;
here the differential oracle is ``_prefill_scan`` inside one process.
Covers: multi-request ragged chunks, segments spanning chunk
boundaries, mid-stream resets (position 0), and continuation from a
previous engine step (carried conv + ssm state, position > 0).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.mamba import (MambaState, _prefill_chunked,
                                _prefill_scan, make_mamba_state,
                                mamba2_mixer)


def make_cfg():
    return ModelConfig(
        vocab_size=128,
        hidden_size=64,
        num_layers=1,
        num_heads=4,
        num_kv_heads=4,
        max_model_len=512,
        dtype="float32",
        mamba_d_state=16,
        mamba_d_conv=4,
        mamba_n_groups=2,
        mamba_num_heads=8,
        mamba_d_inner=128,
    )


def random_layer(cfg, rng):
    d_inner = cfg.mamba_d_inner
    conv_dim = d_inner + 2 * cfg.mamba_n_groups * cfg.mamba_d_state
    nh = cfg.mamba_num_heads

    def f(*shape, scale=0.3):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale)

    proj_out = 2 * d_inner + 2 * cfg.mamba_n_groups * \
        cfg.mamba_d_state + nh
    return {
        "in_proj": {"weight": f(cfg.hidden_size, proj_out, scale=0.2)},
        "conv_w": f(cfg.mamba_d_conv, conv_dim),
        "conv_b": f(conv_dim),
        "A_log": f(nh, scale=0.5),
        "D": f(nh),
        "dt_bias": f(nh),
        "mixer_norm": jnp.ones((d_inner, ), jnp.float32),
        "out_proj": {"weight": f(d_inner, cfg.hidden_size, scale=0.2)},
    }


def _run_both(cfg, layer, x, positions, state, row_of):
    from vllm_tpu.ops.linear import linear
    from vllm_tpu.ops.mamba import _split_proj
    zxbcdt = linear(layer["in_proj"], x)
    gate, xBC, dt_raw = _split_proj(cfg, zxbcdt)
    y_s, st_s = _prefill_scan(cfg, layer, xBC, dt_raw, gate, positions,
                              state, row_of, cfg.rms_norm_eps)
    L = 16
    y_raw, st_c = _prefill_chunked(cfg, layer, xBC, dt_raw, positions,
                                   state, row_of, L)
    from vllm_tpu.ops.mamba import _out
    y_c = _out(cfg, layer, y_raw, gate, cfg.rms_norm_eps)
    return (y_s, st_s), (y_c, st_c)


def test_chunked_matches_scan_ragged_fresh():
    """Three fresh requests sharing chunks, lengths that straddle the
    16-token chunk boundary in every way."""
    cfg = make_cfg()
    rng = np.random.default_rng(0)
    layer = random_layer(cfg, rng)
    R = 6
    lens = [7, 25, 16]  # T = 48 = 3 chunks of 16
    rows = [4, 1, 2]
    T = sum(lens)
    row_of = jnp.asarray(np.repeat(rows, lens).astype(np.int32))
    positions = jnp.asarray(
        np.concatenate([np.arange(n) for n in lens]).astype(np.int32))
    x = jnp.asarray(
        rng.standard_normal((T, cfg.hidden_size)).astype(np.float32))
    state = make_mamba_state(R, cfg, jnp.float32)

    (y_s, st_s), (y_c, st_c) = _run_both(cfg, layer, x, positions,
                                         state, row_of)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_s),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_c.ssm),
                               np.asarray(st_s.ssm), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_c.conv),
                               np.asarray(st_s.conv), rtol=2e-4,
                               atol=2e-4)


def test_chunked_matches_scan_continuation():
    """Chunked-prefill continuation: rows arrive with position > 0 and
    non-zero carried conv/ssm state; a mid-stream reset (position 0)
    must zero its row's carry while others keep theirs."""
    cfg = make_cfg()
    rng = np.random.default_rng(1)
    layer = random_layer(cfg, rng)
    R = 4
    d_inner = cfg.mamba_d_inner
    conv_dim = d_inner + 2 * cfg.mamba_n_groups * cfg.mamba_d_state
    state = MambaState(
        conv=jnp.asarray(
            rng.standard_normal(
                (R, cfg.mamba_d_conv - 1, conv_dim)).astype(np.float32)),
        ssm=jnp.asarray(
            rng.standard_normal(
                (R, cfg.mamba_num_heads, d_inner // cfg.mamba_num_heads,
                 cfg.mamba_d_state)).astype(np.float32) * 0.1),
    )
    # row 0 continues at position 37 (2 tokens — shorter than the conv
    # window, so new conv state must splice old carry), row 2 resets at
    # position 0, row 3 continues at position 3.
    lens = [2, 19, 11]
    rows = [0, 2, 3]
    starts = [37, 0, 3]
    T = sum(lens)
    assert T % 16 == 0
    row_of = jnp.asarray(np.repeat(rows, lens).astype(np.int32))
    positions = jnp.asarray(
        np.concatenate([np.arange(s, s + n)
                        for s, n in zip(starts, lens)]).astype(np.int32))
    x = jnp.asarray(
        rng.standard_normal((T, cfg.hidden_size)).astype(np.float32))

    (y_s, st_s), (y_c, st_c) = _run_both(cfg, layer, x, positions,
                                         state, row_of)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_s),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_c.ssm),
                               np.asarray(st_s.ssm), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_c.conv),
                               np.asarray(st_s.conv), rtol=2e-4,
                               atol=2e-4)


def test_mixer_dispatches_chunked(monkeypatch):
    """mamba2_mixer routes chunk-divisible prefill through the chunked
    path (and still matches the scan numerically)."""
    import vllm_tpu.ops.mamba as mm
    cfg = make_cfg()
    rng = np.random.default_rng(2)
    layer = random_layer(cfg, rng)
    R = 4
    T = 32
    row_of = jnp.asarray(np.repeat([0, 1], [20, 12]).astype(np.int32))
    positions = jnp.asarray(
        np.concatenate([np.arange(20), np.arange(12)]).astype(np.int32))
    x = jnp.asarray(
        rng.standard_normal((T, cfg.hidden_size)).astype(np.float32))
    state = make_mamba_state(R, cfg, jnp.float32)

    called = []
    orig = mm._prefill_chunked

    def spy(*a, **kw):
        called.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(mm, "_prefill_chunked", spy)
    y_c, _ = mamba2_mixer(cfg, layer, x, positions, state, row_of,
                          decode_rows=False)
    assert called, "chunked path not dispatched at T=32"
    monkeypatch.setattr(mm, "_prefill_chunked",
                        lambda *a, **kw: (_ for _ in ()).throw(
                            AssertionError("should use scan")))
    # Non-divisible T falls back to the scan.
    y2, _ = mamba2_mixer(cfg, layer, x[:30], positions[:30], state,
                         row_of[:30], decode_rows=False)
    assert y2.shape == (30, cfg.hidden_size)


def test_many_segments_routes_to_scan():
    """Streams with more segments than the compressed cap must be
    routed to the exact per-token scan via few_segments=False (the
    runner's host-side hint) and produce identical results — here 12
    single-token segments (decode-like) share chunks with a short
    prefill."""
    cfg = make_cfg()
    rng = np.random.default_rng(5)
    layer = random_layer(cfg, rng)
    R = 16
    # 12 decode rows (1 token each, continuing at position >= 1) then
    # one 20-token fresh prefill: T = 32.
    rows = list(range(12)) + [13]
    lens = [1] * 12 + [20]
    starts = [5 + r for r in range(12)] + [0]
    T = sum(lens)
    row_of = jnp.asarray(np.repeat(rows, lens).astype(np.int32))
    positions = jnp.asarray(
        np.concatenate([np.arange(s, s + n)
                        for s, n in zip(starts, lens)]).astype(np.int32))
    x = jnp.asarray(
        rng.standard_normal((T, cfg.hidden_size)).astype(np.float32))
    d_inner = cfg.mamba_d_inner
    conv_dim = d_inner + 2 * cfg.mamba_n_groups * cfg.mamba_d_state
    state = MambaState(
        conv=jnp.asarray(
            rng.standard_normal(
                (R, cfg.mamba_d_conv - 1, conv_dim)).astype(np.float32)),
        ssm=jnp.asarray(
            rng.standard_normal(
                (R, cfg.mamba_num_heads, d_inner // cfg.mamba_num_heads,
                 cfg.mamba_d_state)).astype(np.float32) * 0.1),
    )
    import vllm_tpu.ops.mamba as mm
    called = []
    orig = mm._prefill_scan

    def spy(*a, **kw):
        called.append(1)
        return orig(*a, **kw)

    mm._prefill_scan = spy
    try:
        y_many, st_many = mamba2_mixer(cfg, layer, x, positions, state,
                                       row_of, decode_rows=False,
                                       few_segments=False)
    finally:
        mm._prefill_scan = orig
    assert called, "few_segments=False must route to the exact scan"
    assert y_many.shape == (T, cfg.hidden_size)
