"""GGUF K-quant codecs (Q2_K..Q6_K superblocks).

Two layers of validation:
1. The vectorized numpy decoders in ``loader/gguf_loader.py`` are
   checked bit-for-bit against independent SCALAR transcriptions of the
   public ggml dequant loops (written element-by-element here), over
   random superblock bytes.
2. Q4_K and Q6_K additionally get simple encoders so that
   dequant(quant(w)) ~= w proves the semantics (scales/mins/offsets),
   not just internal consistency.

Ref analog: the reference's gguf kernels
(vllm/model_executor/layers/quantization/gguf.py) consume these same
layouts on GPU; here they dequantize at load (see gguf_loader.py).
"""

import struct

import numpy as np
import pytest

from vllm_tpu.loader.gguf_loader import (GGML_Q2_K, GGML_Q3_K, GGML_Q4_K,
                                         GGML_Q5_K, GGML_Q6_K, _dequant)

QK = 256


def _f16b(x: float) -> bytes:
    return np.float16(x).tobytes()


# ---------------------------------------------------------------------------
# scalar spec transcriptions (direct loop form of the ggml dequant spec)
# ---------------------------------------------------------------------------


def _scale_min_k4_scalar(j, sbytes):
    if j < 4:
        return sbytes[j] & 63, sbytes[j + 4] & 63
    d = (sbytes[j + 4] & 0xF) | ((sbytes[j - 4] >> 6) << 4)
    m = (sbytes[j + 4] >> 4) | ((sbytes[j] >> 6) << 4)
    return d, m


def _scalar_q2_k(blk: bytes) -> np.ndarray:
    scales = blk[:16]
    qs = blk[16:80]
    d = np.frombuffer(blk[80:82], "<f2")[0].astype(np.float32)
    dmin = np.frombuffer(blk[82:84], "<f2")[0].astype(np.float32)
    y = np.empty(QK, np.float32)
    i = 0
    is_ = 0
    qoff = 0
    for n in range(0, QK, 128):
        shift = 0
        for _j in range(4):
            for half in range(2):
                sc = scales[is_]
                is_ += 1
                dl = d * (sc & 0xF)
                ml = dmin * (sc >> 4)
                for l in range(16):
                    q = (qs[qoff + half * 16 + l] >> shift) & 3
                    y[i] = dl * q - ml
                    i += 1
            shift += 2
        qoff += 32
    return y


def _scalar_q3_k(blk: bytes) -> np.ndarray:
    hmask = blk[:32]
    qs = blk[32:96]
    sb = blk[96:108]
    d = np.frombuffer(blk[108:110], "<f2")[0].astype(np.float32)
    # 16 6-bit scales from 12 bytes (aux-word trick, byte form)
    sc = [0] * 16
    for i in range(4):
        sc[i] = (sb[i] & 0xF) | (((sb[8 + i] >> 0) & 3) << 4)
        sc[4 + i] = (sb[4 + i] & 0xF) | (((sb[8 + i] >> 2) & 3) << 4)
        sc[8 + i] = (sb[i] >> 4) | (((sb[8 + i] >> 4) & 3) << 4)
        sc[12 + i] = (sb[4 + i] >> 4) | (((sb[8 + i] >> 6) & 3) << 4)
    y = np.empty(QK, np.float32)
    i = 0
    is_ = 0
    m = 1
    qoff = 0
    for n in range(0, QK, 128):
        shift = 0
        for _j in range(4):
            for half in range(2):
                dl = d * (sc[is_] - 32)
                is_ += 1
                for l in range(16):
                    idx = half * 16 + l
                    q = (qs[qoff + idx] >> shift) & 3
                    if not (hmask[idx] & m):
                        q -= 4
                    y[i] = dl * q
                    i += 1
            shift += 2
            m <<= 1
        qoff += 32
    return y


def _scalar_q4_k(blk: bytes) -> np.ndarray:
    d = np.frombuffer(blk[0:2], "<f2")[0].astype(np.float32)
    dmin = np.frombuffer(blk[2:4], "<f2")[0].astype(np.float32)
    sbytes = blk[4:16]
    qs = blk[16:144]
    y = np.empty(QK, np.float32)
    i = 0
    is_ = 0
    qoff = 0
    for _span in range(4):
        sc1, m1 = _scale_min_k4_scalar(is_, sbytes)
        sc2, m2 = _scale_min_k4_scalar(is_ + 1, sbytes)
        for l in range(32):
            y[i] = d * sc1 * (qs[qoff + l] & 0xF) - dmin * m1
            i += 1
        for l in range(32):
            y[i] = d * sc2 * (qs[qoff + l] >> 4) - dmin * m2
            i += 1
        qoff += 32
        is_ += 2
    return y


def _scalar_q5_k(blk: bytes) -> np.ndarray:
    d = np.frombuffer(blk[0:2], "<f2")[0].astype(np.float32)
    dmin = np.frombuffer(blk[2:4], "<f2")[0].astype(np.float32)
    sbytes = blk[4:16]
    qh = blk[16:48]
    qs = blk[48:176]
    y = np.empty(QK, np.float32)
    i = 0
    is_ = 0
    qoff = 0
    u1, u2 = 1, 2
    for _span in range(4):
        sc1, m1 = _scale_min_k4_scalar(is_, sbytes)
        sc2, m2 = _scale_min_k4_scalar(is_ + 1, sbytes)
        for l in range(32):
            q = (qs[qoff + l] & 0xF) + (16 if qh[l] & u1 else 0)
            y[i] = d * sc1 * q - dmin * m1
            i += 1
        for l in range(32):
            q = (qs[qoff + l] >> 4) + (16 if qh[l] & u2 else 0)
            y[i] = d * sc2 * q - dmin * m2
            i += 1
        qoff += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return y


def _scalar_q6_k(blk: bytes) -> np.ndarray:
    ql = blk[:128]
    qh = blk[128:192]
    sc = np.frombuffer(blk[192:208], np.int8)
    d = np.frombuffer(blk[208:210], "<f2")[0].astype(np.float32)
    y = np.empty(QK, np.float32)
    yo = 0
    qlo = 0
    qho = 0
    so = 0
    for _n in range(2):
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[qlo + l] & 0xF) | (((qh[qho + l] >> 0) & 3) << 4)) - 32
            q2 = ((ql[qlo + l + 32] & 0xF) | (((qh[qho + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[qlo + l] >> 4) | (((qh[qho + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[qlo + l + 32] >> 4) | (((qh[qho + l] >> 6) & 3) << 4)) - 32
            y[yo + l] = d * sc[so + is_] * q1
            y[yo + l + 32] = d * sc[so + is_ + 2] * q2
            y[yo + l + 64] = d * sc[so + is_ + 4] * q3
            y[yo + l + 96] = d * sc[so + is_ + 6] * q4
        yo += 128
        qlo += 64
        qho += 32
        so += 8
    return y


# random superblocks with well-formed f16 scale fields


def _rand_block(rng, ttype: int) -> bytes:
    d = _f16b(rng.uniform(0.001, 0.1))
    dmin = _f16b(rng.uniform(0.001, 0.1))
    rb = lambda n: bytes(rng.integers(0, 256, n, dtype=np.uint8))
    if ttype == GGML_Q2_K:
        return rb(16) + rb(64) + d + dmin
    if ttype == GGML_Q3_K:
        return rb(32) + rb(64) + rb(12) + d
    if ttype == GGML_Q4_K:
        return d + dmin + rb(12) + rb(128)
    if ttype == GGML_Q5_K:
        return d + dmin + rb(12) + rb(32) + rb(128)
    if ttype == GGML_Q6_K:
        return rb(128) + rb(64) + rb(16) + d
    raise AssertionError(ttype)


_SCALAR = {GGML_Q2_K: _scalar_q2_k, GGML_Q3_K: _scalar_q3_k,
           GGML_Q4_K: _scalar_q4_k, GGML_Q5_K: _scalar_q5_k,
           GGML_Q6_K: _scalar_q6_k}


@pytest.mark.parametrize("ttype", sorted(_SCALAR))
def test_vectorized_matches_scalar_spec(ttype):
    rng = np.random.default_rng(ttype)
    blocks = [_rand_block(rng, ttype) for _ in range(5)]
    raw = b"".join(blocks)
    got = _dequant(raw, ttype, 5 * QK)
    want = np.concatenate([_SCALAR[ttype](b) for b in blocks])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# round-trip: simple encoders -> dequant recovers the values
# ---------------------------------------------------------------------------


def _encode_q6_k(w: np.ndarray) -> bytes:
    """[256] -> one Q6_K superblock (16 groups of 16, q in [-32, 31])."""
    g = w.reshape(16, 16)
    gmax = np.abs(g).max(axis=1)
    d = float(gmax.max()) / (127.0 * 31.0) or 1.0
    sc = np.clip(np.round(gmax / (31.0 * d)), 1, 127).astype(np.int8)
    q = np.clip(np.round(g / (d * sc[:, None].astype(np.float64))),
                -32, 31).astype(np.int32) + 32  # 6-bit 0..63
    # scatter into the (half, quarter, l) layout the decoder reads
    ql = np.zeros(128, np.uint8)
    qh = np.zeros(64, np.uint8)
    flat = q.reshape(256)
    for i in range(256):
        half, r = divmod(i, 128)
        quarter, l = divmod(r, 32)
        v = int(flat[i])
        lo, hi = v & 0xF, v >> 4
        if quarter == 0:
            ql[half * 64 + l] |= lo
            qh[half * 32 + l] |= hi << 0
        elif quarter == 1:
            ql[half * 64 + l + 32] |= lo
            qh[half * 32 + l] |= hi << 2
        elif quarter == 2:
            ql[half * 64 + l] |= lo << 4
            qh[half * 32 + l] |= hi << 4
        else:
            ql[half * 64 + l + 32] |= lo << 4
            qh[half * 32 + l] |= hi << 6
    return (bytes(ql) + bytes(qh) + sc.tobytes() + _f16b(d))


def _encode_q4_k(w: np.ndarray) -> bytes:
    """[256] -> one Q4_K superblock (8 groups of 32; w = d*sc*q - dmin*m)."""
    g = w.reshape(8, 32)
    gmin = np.minimum(g.min(axis=1), 0.0)   # m >= 0 shifts up
    scale = (g.max(axis=1) - gmin) / 15.0
    d = float(scale.max()) / 63.0 or 1.0
    dmin = float((-gmin).max()) / 63.0 or 1.0
    sc6 = np.clip(np.round(scale / d), 1, 63).astype(np.uint8)
    mn6 = np.clip(np.round(-gmin / dmin), 0, 63).astype(np.uint8)
    q = np.clip(np.round((g + dmin * mn6[:, None]) / (d * sc6[:, None])),
                0, 15).astype(np.uint8)
    sbytes = bytearray(12)
    for j in range(4):
        sbytes[j] = sc6[j] & 63
        sbytes[j + 4] = mn6[j] & 63
    for j in range(4, 8):
        sbytes[j - 4] |= (sc6[j] >> 4) << 6
        sbytes[j] |= (mn6[j] >> 4) << 6
        sbytes[j + 4] = (sc6[j] & 0xF) | ((mn6[j] & 0xF) << 4)
    qs = np.zeros(128, np.uint8)
    for span in range(4):
        lo = q[2 * span]
        hi = q[2 * span + 1]
        qs[span * 32:(span + 1) * 32] = lo | (hi << 4)
    return _f16b(d) + _f16b(dmin) + bytes(sbytes) + bytes(qs)


def test_q6_k_roundtrip_quality():
    rng = np.random.default_rng(7)
    w = rng.standard_normal(4 * QK).astype(np.float32) * 0.3
    raw = b"".join(_encode_q6_k(w[i * QK:(i + 1) * QK]) for i in range(4))
    got = _dequant(raw, GGML_Q6_K, 4 * QK)
    # 6-bit symmetric: ~absmax/32 per group + scale quantization
    err = np.abs(got - w)
    assert err.max() < 0.05, err.max()
    assert np.corrcoef(got, w)[0, 1] > 0.999


def test_q4_k_roundtrip_quality():
    rng = np.random.default_rng(8)
    w = rng.standard_normal(4 * QK).astype(np.float32) * 0.3
    raw = b"".join(_encode_q4_k(w[i * QK:(i + 1) * QK]) for i in range(4))
    got = _dequant(raw, GGML_Q4_K, 4 * QK)
    err = np.abs(got - w)
    assert err.max() < 0.2, err.max()
    assert np.corrcoef(got, w)[0, 1] > 0.99


def test_engine_loads_q4k_q6k_gguf(tmp_path):
    """End-to-end: a tiny llama GGUF whose projections are Q4_K/Q6_K
    loads and generates deterministically."""
    from tests.loader.test_gguf import _s  # reuse the string packer
    from vllm_tpu.engine.llm import LLM
    from vllm_tpu.sample.params import SamplingParams

    # extend the writer's codec table via pre-encoded raw blobs: write
    # the file manually with the K-quant payloads
    rng = np.random.default_rng(3)
    E, I, H, KH, L, V = 64, 96, 4, 2, 1, 128
    D = E // H
    meta = {"llama.block_count": L, "llama.context_length": 128,
            "llama.embedding_length": E, "llama.feed_forward_length": I,
            "llama.attention.head_count": H,
            "llama.attention.head_count_kv": KH, "llama.vocab_size": V}
    w = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)

    def enc(arr, ttype):
        flat = arr.astype(np.float32).reshape(-1)
        assert flat.size % QK == 0
        f = _encode_q4_k if ttype == GGML_Q4_K else _encode_q6_k
        return b"".join(f(flat[i * QK:(i + 1) * QK])
                        for i in range(flat.size // QK))

    tensors = [("token_embd.weight", w(V, E), 1),
               ("output_norm.weight", np.ones(E, np.float32), 0),
               ("output.weight", w(V, E), GGML_Q6_K),
               ("blk.0.attn_norm.weight", np.ones(E, np.float32), 0),
               ("blk.0.ffn_norm.weight", np.ones(E, np.float32), 0),
               ("blk.0.attn_q.weight", w(H * D, E), GGML_Q4_K),
               ("blk.0.attn_k.weight", w(KH * D, E), GGML_Q4_K),
               ("blk.0.attn_v.weight", w(KH * D, E), GGML_Q6_K),
               ("blk.0.attn_output.weight", w(E, H * D), GGML_Q4_K),
               ("blk.0.ffn_gate.weight", w(I, E), GGML_Q4_K),
               ("blk.0.ffn_up.weight", w(I, E), GGML_Q4_K),
               ("blk.0.ffn_down.weight", w(E, I), GGML_Q6_K)]

    # manual writer (K-quant aware): header/kv via the existing helpers
    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors),
                         2 + len(meta))
    kv = _s("general.architecture") + struct.pack("<I", 8) + _s("llama")
    for k, v in meta.items():
        kv += _s(k) + struct.pack("<II", 4, v)
    kv += (_s("llama.attention.layer_norm_rms_epsilon") +
           struct.pack("<If", 6, 1e-5))
    infos, blobs, off = b"", [], 0
    for name, arr, ttype in tensors:
        if ttype == 0:
            blob = arr.astype(np.float32).tobytes()
        elif ttype == 1:
            blob = arr.astype(np.float16).tobytes()
        else:
            blob = enc(arr, ttype)
        dims = tuple(reversed(arr.shape))
        infos += (_s(name) + struct.pack("<I", len(dims)) +
                  struct.pack(f"<{len(dims)}Q", *dims) +
                  struct.pack("<IQ", ttype, off))
        blobs.append(blob)
        off += (len(blob) + 31) // 32 * 32
    body = header + kv + infos
    path = str(tmp_path / "k.gguf")
    with open(path, "wb") as f:
        f.write(body + b"\0" * ((-len(body)) % 32))
        for blob in blobs:
            f.write(blob + b"\0" * ((-len(blob)) % 32))

    llm = LLM(path, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, num_kv_blocks=17,
              enable_prefix_caching=False)
    out = llm.generate([[5, 9, 17, 33]],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 4
