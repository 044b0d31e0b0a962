"""Per-token-head quantized KV cache: XLA reference + Pallas kernels
(interpret mode) + e2e engine decode with int8 KV.

Ref analog: the int8/fp8 per-token-head modes of
vllm/v1/attention/ops/int4_per_token_head.py and _cast_kv_tile in
triton_unified_attention.py:38 — here QuantKV (data + lane-resident
scale planes, ops/kv_cache.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_tpu.ops.attention import ragged_paged_attention_xla
from vllm_tpu.ops.kv_cache import (QuantKV, dequant_block_kv,
                                   kv_cache_shape, make_kv_cache,
                                   quantize_rows, write_kv_xla)
from vllm_tpu.ops.pallas.decode_attention import decode_paged_attention
from vllm_tpu.ops.pallas.ragged_attention import ragged_paged_attention


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((5, 8, 128)), jnp.float32)
    q, s = quantize_rows(kv, jnp.int8)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq - kv))
    amax = np.abs(np.asarray(kv)).max(-1, keepdims=True)
    assert (err <= amax / 127 * 0.51 + 1e-7).all()


def test_write_kv_xla_quant_contents():
    rng = np.random.default_rng(1)
    KH, D, bs = 2, 128, 16
    cache = make_kv_cache(8, bs, KH, D, "int8", "float32")
    assert isinstance(cache, QuantKV)
    k = jnp.asarray(rng.standard_normal((3, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, KH, D)), jnp.float32)
    slots = jnp.asarray([5, 17, 33])  # blocks 0,1,2
    cache = write_kv_xla(cache, k, v, slots)
    deq = np.asarray(dequant_block_kv(cache))
    kv = np.concatenate([np.asarray(k), np.asarray(v)], 1)  # split order
    for t, slot in enumerate([5, 17, 33]):
        got = deq[slot // bs, :, slot % bs, :]
        amax = np.abs(kv[t]).max(-1, keepdims=True)
        assert (np.abs(got - kv[t]) <= amax / 127 * 0.51 + 1e-7).all()


def _quant_case(rng, ctx_lens, H=8, KH=4, D=64, bs=16, max_blocks=8,
                mode="int8"):
    """Paged QuantKV cache pre-filled with quantized random rows;
    returns float twin cache for the reference."""
    R = len(ctx_lens)
    num_blocks = R * max_blocks + 1
    q = jnp.asarray(rng.standard_normal((R, H, D)), jnp.float32)
    new_k = jnp.asarray(rng.standard_normal((R, KH, D)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((R, KH, D)), jnp.float32)
    cache = make_kv_cache(num_blocks, bs, KH, D, mode, "float32")
    bt = np.zeros((R, max_blocks), np.int32)
    sl = np.zeros(R, np.int32)
    nxt = 1
    slots, ks, vs = [], [], []
    for i, cl in enumerate(ctx_lens):
        sl[i] = cl
        nblk = -(-max(cl, 1) // bs)
        bt[i, :nblk] = range(nxt, nxt + nblk)
        nxt += nblk
        for t in range(max(cl - 1, 0)):  # existing context (cl-1 toks)
            slots.append(int(bt[i, t // bs]) * bs + t % bs)
    if slots:
        ctx_k = jnp.asarray(
            rng.standard_normal((len(slots), KH, D)), jnp.float32)
        ctx_v = jnp.asarray(
            rng.standard_normal((len(slots), KH, D)), jnp.float32)
        cache = write_kv_xla(cache, ctx_k, ctx_v,
                             jnp.asarray(slots, jnp.int32))
    return q, new_k, new_v, cache, jnp.asarray(bt), jnp.asarray(sl)


def _float_twin(cache: QuantKV) -> jax.Array:
    return dequant_block_kv(cache).astype(jnp.float32)


@pytest.mark.parametrize("mode", ["int8", "fp8_pth", "int4", "tq4",
                                  "tq3"])
@pytest.mark.parametrize("ctx_lens", [[17], [16, 1, 33, 120], [5, 0, 9]])
def test_fused_decode_quant_matches_dequant_reference(ctx_lens, mode):
    rng = np.random.default_rng(0)
    q, nk, nv, cache, bt, sl = _quant_case(rng, ctx_lens, mode=mode)
    # Reference: attend over the dequantized cache + exactly-quantized
    # new row (quantization error accounted by quantizing first).
    bs = 16
    pos = jnp.maximum(sl - 1, 0)
    slots = (jnp.take_along_axis(bt, (pos // bs)[:, None],
                                 axis=1)[:, 0] * bs + pos % bs)
    ref_cache = write_kv_xla(cache, nk, nv, slots)
    ref_kv = _float_twin(ref_cache)
    qsl = jnp.arange(len(ctx_lens) + 1, dtype=jnp.int32)
    ref_out = ragged_paged_attention_xla(q, ref_kv, bt, qsl, sl,
                                         sm_scale=0.125)
    got_out, got_cache = decode_paged_attention(q, nk, nv, cache, bt, sl,
                                                sm_scale=0.125,
                                                interpret=True)
    active = np.asarray(sl) > 0
    np.testing.assert_allclose(np.asarray(got_out)[active],
                               np.asarray(ref_out)[active], rtol=2e-2,
                               atol=2e-2)
    # Cache contents written by the kernel must match the XLA quantizer
    # bit-for-bit (same round rule).
    bt_np = np.asarray(bt)
    ref_deq = np.asarray(_float_twin(ref_cache))
    got_deq = np.asarray(_float_twin(got_cache))
    for i, cl in enumerate(ctx_lens):
        if cl == 0:
            continue
        b = bt_np[i][(cl - 1) // bs]
        off = (cl - 1) % bs
        np.testing.assert_allclose(got_deq[b, :, off], ref_deq[b, :, off],
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"row {i} block {b}")


def test_fused_decode_quant_multi_head_group():
    rng = np.random.default_rng(3)
    q, nk, nv, cache, bt, sl = _quant_case(rng, [20, 47], H=16, KH=16,
                                           max_blocks=4)
    bs = 16
    pos = jnp.maximum(sl - 1, 0)
    slots = (jnp.take_along_axis(bt, (pos // bs)[:, None],
                                 axis=1)[:, 0] * bs + pos % bs)
    ref_kv = _float_twin(write_kv_xla(cache, nk, nv, slots))
    qsl = jnp.arange(3, dtype=jnp.int32)
    ref_out = ragged_paged_attention_xla(q, ref_kv, bt, qsl, sl,
                                         sm_scale=0.125)
    got_out, _ = decode_paged_attention(q, nk, nv, cache, bt, sl,
                                        sm_scale=0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["int8", "fp8_pth", "int4", "tq4",
                                  "tq3"])
def test_ragged_prefill_quant_matches_dequant_reference(mode):
    rng = np.random.default_rng(5)
    # Mixed prefill: rows with multiple query tokens.
    ctx_lens = [40, 90]
    q_lens = [8, 24]
    R = 2
    H, KH, D, bs = 8, 4, 64, 16
    _, _, _, cache, bt, sl = _quant_case(rng, ctx_lens, H=H, KH=KH,
                                         max_blocks=8, mode=mode)
    # also write the "current chunk" tokens into the cache (prefill
    # contract: write-through happens before attention).
    slots, off = [], []
    bt_np = np.asarray(bt)
    for i, (cl, ql) in enumerate(zip(ctx_lens, q_lens)):
        for t in range(cl - 1, cl - 1 + 0):
            pass
    # build the ragged q stream
    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    cur_k = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    cur_v = jnp.asarray(rng.standard_normal((T, KH, D)), jnp.float32)
    qsl = jnp.asarray(np.cumsum([0] + q_lens), jnp.int32)
    slot_list = []
    for i, (cl, ql) in enumerate(zip(ctx_lens, q_lens)):
        # current tokens occupy positions [cl-ql, cl)
        for p in range(cl - ql, cl):
            slot_list.append(int(bt_np[i, p // bs]) * bs + p % bs)
    cache = write_kv_xla(cache, cur_k, cur_v,
                         jnp.asarray(slot_list, jnp.int32))
    ref = ragged_paged_attention_xla(q, _float_twin(cache), bt, qsl,
                                     sl, sm_scale=0.125)
    got = ragged_paged_attention(q, cache, bt, qsl, sl, sm_scale=0.125,
                                 q_blk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_engine_decode_int8_kv_close_to_bf16():
    """E2E: same tiny model decoded with auto vs int8 KV produces the
    same greedy tokens (weak but real signal at short contexts)."""
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    def run(cache_dtype):
        mc = ModelConfig(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_layers=2,
                         num_heads=4, num_kv_heads=2, max_model_len=96,
                         dtype="float32")
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(block_size=16, num_gpu_blocks=25,
                              cache_dtype=cache_dtype),
            scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                      max_num_seqs=2),
        )
        mc.eos_token_ids = []
        params = llama.random_params(mc, seed=11)
        eng = LLMEngine(cfg, params=params, tokenizer=None)
        rid = eng.add_request(list(range(10, 30)),
                              SamplingParams(temperature=0.0,
                                             max_tokens=16,
                                             ignore_eos=True))
        toks = None
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    toks = o.outputs[0].token_ids
        return toks

    base = run("auto")
    quant = run("int8")
    assert base is not None and quant is not None
    matching = sum(a == b for a, b in zip(base, quant))
    assert matching >= len(base) - 2, (base, quant)
