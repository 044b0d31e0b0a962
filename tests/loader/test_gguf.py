"""GGUF checkpoint reader (ref analog: the reference's gguf path —
--model x.gguf + gguf block-quant tensors). The test WRITES a spec-
conformant GGUF v3 file (llama arch, F32/F16/Q4_0/Q8_0 tensors) and
asserts the parser's dequantization and the end-to-end engine load."""

import struct

import numpy as np
import pytest

GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q8_0 = 0, 1, 2, 8


def _s(txt: str) -> bytes:
    b = txt.encode()
    return struct.pack("<Q", len(b)) + b


def _kv_u32(k, v):
    return _s(k) + struct.pack("<I", 4) + struct.pack("<I", v)


def _kv_f32(k, v):
    return _s(k) + struct.pack("<I", 6) + struct.pack("<f", v)


def _q4_0(w: np.ndarray) -> bytes:
    """float [n] -> Q4_0 blocks (d f16 | 16 bytes)."""
    out = b""
    for blk in w.reshape(-1, 32):
        d = np.abs(blk).max() / 7.0 or 1.0
        q = np.clip(np.round(blk / d) + 8, 0, 15).astype(np.uint8)
        lo, hi = q[:16], q[16:]
        out += np.float16(d).tobytes() + bytes(lo | (hi << 4))
    return out


def _q8_0(w: np.ndarray) -> bytes:
    out = b""
    for blk in w.reshape(-1, 32):
        d = np.abs(blk).max() / 127.0 or 1.0
        q = np.clip(np.round(blk / d), -127, 127).astype(np.int8)
        out += np.float16(d).tobytes() + q.tobytes()
    return out


def write_gguf(path, meta_u32, meta_f32, tensors):
    """tensors: list of (name, array [out, in] or [n], ggml_type)."""
    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors),
                         len(meta_u32) + len(meta_f32) + 1)
    kv = _s("general.architecture") + struct.pack("<I", 8) + _s("llama")
    for k, v in meta_u32.items():
        kv += _kv_u32(k, v)
    for k, v in meta_f32.items():
        kv += _kv_f32(k, v)
    infos = b""
    blobs = []
    off = 0
    for name, arr, ttype in tensors:
        dims = tuple(reversed(arr.shape))  # ggml order
        flat = arr.astype(np.float32).reshape(-1)
        if ttype == GGML_F32:
            blob = flat.tobytes()
        elif ttype == GGML_F16:
            blob = flat.astype(np.float16).tobytes()
        elif ttype == GGML_Q4_0:
            blob = _q4_0(flat)
        elif ttype == GGML_Q8_0:
            blob = _q8_0(flat)
        infos += (_s(name) + struct.pack("<I", len(dims)) +
                  struct.pack(f"<{len(dims)}Q", *dims) +
                  struct.pack("<IQ", ttype, off))
        blobs.append(blob)
        off += (len(blob) + 31) // 32 * 32
    body = header + kv + infos
    pad = (-len(body)) % 32
    with open(path, "wb") as f:
        f.write(body + b"\0" * pad)
        for blob in blobs:
            f.write(blob + b"\0" * ((-len(blob)) % 32))


def test_parse_and_dequant(tmp_path):
    from vllm_tpu.loader.gguf_loader import parse_gguf
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((64, )).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    write_gguf(path, {"llama.block_count": 1}, {},
               [("x.weight", a, GGML_Q4_0), ("y.weight", a, GGML_Q8_0),
                ("z.weight", b, GGML_F32), ("w.weight", a, GGML_F16)])
    meta, tensors = parse_gguf(path)
    assert meta["general.architecture"] == "llama"
    np.testing.assert_allclose(tensors["z.weight"], b)
    np.testing.assert_allclose(tensors["w.weight"], a, atol=2e-3)
    # Q8_0 ~ 1% of scale; Q4_0 ~ 1/7 of per-block absmax
    assert np.abs(tensors["y.weight"] - a).max() < 0.02
    assert np.abs(tensors["x.weight"] - a).max() < 0.35
    assert tensors["x.weight"].shape == (8, 64)


def _tiny_llama_gguf(path, rng):
    E, I, H, KH, L, V = 64, 96, 4, 2, 2, 128
    D = E // H
    meta = {
        "llama.block_count": L,
        "llama.context_length": 128,
        "llama.embedding_length": E,
        "llama.feed_forward_length": I,
        "llama.attention.head_count": H,
        "llama.attention.head_count_kv": KH,
        "llama.vocab_size": V,
    }
    w = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    tensors = [("token_embd.weight", w(V, E), GGML_F16),
               ("output_norm.weight", np.ones(E, np.float32), GGML_F32),
               ("output.weight", w(V, E), GGML_Q8_0)]
    for i in range(L):
        tensors += [
            (f"blk.{i}.attn_norm.weight", np.ones(E, np.float32),
             GGML_F32),
            (f"blk.{i}.ffn_norm.weight", np.ones(E, np.float32),
             GGML_F32),
            (f"blk.{i}.attn_q.weight", w(H * D, E), GGML_Q4_0),
            (f"blk.{i}.attn_k.weight", w(KH * D, E), GGML_Q4_0),
            (f"blk.{i}.attn_v.weight", w(KH * D, E), GGML_Q8_0),
            (f"blk.{i}.attn_output.weight", w(E, H * D), GGML_Q4_0),
            (f"blk.{i}.ffn_gate.weight", w(I, E), GGML_Q4_0),
            (f"blk.{i}.ffn_up.weight", w(I, E), GGML_Q4_0),
            (f"blk.{i}.ffn_down.weight", w(E, I), GGML_Q4_0),
        ]
    write_gguf(path, meta, {"llama.attention.layer_norm_rms_epsilon":
                            1e-5}, tensors)


def test_engine_loads_gguf_and_generates(tmp_path):
    from vllm_tpu.engine.llm import LLM
    from vllm_tpu.sample.params import SamplingParams
    path = str(tmp_path / "tiny.gguf")
    _tiny_llama_gguf(path, np.random.default_rng(1))
    llm = LLM(path, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, num_kv_blocks=17,
              enable_prefix_caching=False)
    cfg = llm.engine.config.model
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2
    out = llm.generate([[5, 9, 17, 33]],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 4
    # deterministic across a reload
    llm2 = LLM(path, dtype="float32", max_model_len=64, block_size=16,
               max_num_seqs=2, num_kv_blocks=17,
               enable_prefix_caching=False)
    out2 = llm2.generate([[5, 9, 17, 33]],
                         SamplingParams(temperature=0.0, max_tokens=4,
                                        ignore_eos=True))[0]
    assert out.outputs[0].token_ids == out2.outputs[0].token_ids
