"""GGUF checkpoint reader (llama.cpp format).

Ref analog: the reference's gguf quantization path
(vllm/model_executor/layers/quantization/gguf.py + --model *.gguf
support in the loader). TPU-native treatment: the file's block-quant
tensors (Q4_0/Q4_1/Q8_0) dequantize at load into dense bf16 leaves —
their block/superblock fp16-scale layouts do not match the g128 layout
the fused Pallas kernels stream, so serving quantization is re-applied
online (``--quantization int4/w4a8/...``) when wanted. Supported
codecs: Q4_0/Q4_1/Q8_0 block-32 and the K-quant superblock family
(Q2_K/Q3_K/Q4_K/Q5_K/Q6_K, 256-element superblocks).

Format (GGUF v2/v3, little-endian):
    magic 'GGUF' | version u32 | n_tensors u64 | n_kv u64
    kv*:     key (u64 len + utf8) | type u32 | value
    tensor*: name | n_dims u32 | dims u64[n] (ggml order: dims[0]
             fastest == in-features) | dtype u32 | offset u64
    data:    aligned to general.alignment (default 32)

GGUF files are self-describing: ``model_config_from_gguf`` builds the
ModelConfig from the llama.* metadata keys, so ``LLM("model.gguf")``
works without a config.json.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO

import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_MAGIC = 0x46554747  # 'GGUF'

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32 = range(6)
_T_F32, _T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = range(6, 13)
_SCALARS = {
    _T_U8: ("<B", 1), _T_I8: ("<b", 1), _T_U16: ("<H", 2),
    _T_I16: ("<h", 2), _T_U32: ("<I", 4), _T_I32: ("<i", 4),
    _T_F32: ("<f", 4), _T_BOOL: ("<?", 1), _T_U64: ("<Q", 8),
    _T_I64: ("<q", 8), _T_F64: ("<d", 8),
}

# tensor dtypes
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q8_0 = 8
GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 10, 11, 12, 13, 14
GGML_BF16 = 30
_NAMES = {0: "F32", 1: "F16", 2: "Q4_0", 3: "Q4_1", 8: "Q8_0",
          10: "Q2_K", 11: "Q3_K", 12: "Q4_K", 13: "Q5_K", 14: "Q6_K",
          30: "BF16"}


def _read_str(f: BinaryIO) -> str:
    (n, ) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _SCALARS:
        fmt, sz = _SCALARS[vtype]
        return struct.unpack(fmt, f.read(sz))[0]
    if vtype == _T_STR:
        return _read_str(f)
    if vtype == _T_ARR:
        (etype, ) = struct.unpack("<I", f.read(4))
        (n, ) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"unknown gguf metadata type {vtype}")


def _dequant(raw: bytes, ggml_type: int, n: int) -> np.ndarray:
    """Raw tensor bytes -> flat float32 [n]."""
    if ggml_type == GGML_F32:
        return np.frombuffer(raw, "<f4", n).astype(np.float32)
    if ggml_type == GGML_F16:
        return np.frombuffer(raw, "<f2", n).astype(np.float32)
    if ggml_type == GGML_BF16:
        u = np.frombuffer(raw, "<u2", n).astype(np.uint32) << 16
        return u.view(np.float32) if u.flags.c_contiguous else \
            np.ascontiguousarray(u).view(np.float32)
    nb = n // 32  # all block formats below use 32-wide blocks
    if ggml_type == GGML_Q4_0:  # d f16 | 16B nibbles; w = d*(q-8)
        rec = np.frombuffer(raw, dtype=np.dtype([("d", "<f2"),
                                                 ("qs", "u1", 16)]), count=nb)
        lo = (rec["qs"] & 0xF).astype(np.float32) - 8.0
        hi = (rec["qs"] >> 4).astype(np.float32) - 8.0
        w = np.concatenate([lo, hi], axis=1)  # [nb, 32]
        return (w * rec["d"].astype(np.float32)[:, None]).reshape(-1)
    if ggml_type == GGML_Q4_1:  # d f16 | m f16 | 16B; w = d*q + m
        rec = np.frombuffer(raw, dtype=np.dtype([("d", "<f2"),
                                                 ("m", "<f2"),
                                                 ("qs", "u1", 16)]), count=nb)
        lo = (rec["qs"] & 0xF).astype(np.float32)
        hi = (rec["qs"] >> 4).astype(np.float32)
        w = np.concatenate([lo, hi], axis=1)
        return (w * rec["d"].astype(np.float32)[:, None] +
                rec["m"].astype(np.float32)[:, None]).reshape(-1)
    if ggml_type == GGML_Q8_0:  # d f16 | 32 x i8; w = d*q
        rec = np.frombuffer(raw, dtype=np.dtype([("d", "<f2"),
                                                 ("qs", "i1", 32)]), count=nb)
        return (rec["qs"].astype(np.float32) *
                rec["d"].astype(np.float32)[:, None]).reshape(-1)
    if ggml_type in _KDEQUANT:
        return _KDEQUANT[ggml_type](raw, n // 256)
    raise NotImplementedError(
        f"gguf tensor type {_NAMES.get(ggml_type, ggml_type)} not "
        "supported")


# ---------------------------------------------------------------------------
# K-quants: 256-element superblocks (llama.cpp "k-quants"). All layouts are
# from the public GGUF/ggml spec; vectorized numpy re-derivations, validated
# against scalar spec transcriptions in tests/loader/test_gguf_kquants.py.
# ---------------------------------------------------------------------------


def _f32(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float32)


def _scale_min_k4(s: np.ndarray):
    """Unpack the 12-byte packed (scale, min) pairs used by Q4_K/Q5_K.

    s: uint8 [nb, 12] -> (sc [nb, 8], mn [nb, 8]) float32, each 6-bit.
    Pairs 0-3 live in the low 6 bits of bytes 0-3 / 4-7; pairs 4-7 pack
    their low nibble into bytes 8-11 and their top 2 bits into the high
    bits of bytes 0-7.
    """
    nb = s.shape[0]
    sc = np.empty((nb, 8), np.float32)
    mn = np.empty((nb, 8), np.float32)
    for j in range(4):
        sc[:, j] = s[:, j] & 63
        mn[:, j] = s[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (s[:, j + 4] & 0xF) | ((s[:, j - 4] >> 6) << 4)
        mn[:, j] = (s[:, j + 4] >> 4) | ((s[:, j] >> 6) << 4)
    return sc, mn


def _dequant_q2_k(raw: bytes, nb: int) -> np.ndarray:
    """Q2_K: 16 groups of 16; per group 4-bit scale + 4-bit min in one
    byte; w = d*sc*q - dmin*m, q 2-bit. 84 B/superblock."""
    rec = np.frombuffer(raw, np.dtype([("scales", "u1", 16),
                                       ("qs", "u1", 64), ("d", "<f2"),
                                       ("dmin", "<f2")]), count=nb)
    # element (n, j, h, l): q = (qs[32n + 16h + l] >> 2j) & 3,
    # group index = 8n + 2j + h
    qs = rec["qs"].reshape(nb, 2, 1, 2, 16)
    shifts = (2 * np.arange(4)).reshape(1, 1, 4, 1, 1)
    q = ((qs >> shifts) & 3).astype(np.float32)        # [nb,2,4,2,16]
    sc = rec["scales"].reshape(nb, 2, 4, 2)
    d = _f32(rec["d"]).reshape(nb, 1, 1, 1)
    dmin = _f32(rec["dmin"]).reshape(nb, 1, 1, 1)
    dl = d * (sc & 0xF)
    ml = dmin * (sc >> 4)
    return (dl[..., None] * q - ml[..., None]).reshape(-1)


def _dequant_q3_k(raw: bytes, nb: int) -> np.ndarray:
    """Q3_K: 16 groups of 16, 6-bit signed scales (12 packed bytes),
    w = d*(sc-32)*q, q = 2-bit low + 1 high bit from hmask (clear bit
    means subtract 4). 110 B/superblock."""
    rec = np.frombuffer(raw, np.dtype([("hmask", "u1", 32),
                                       ("qs", "u1", 64),
                                       ("scales", "u1", 12),
                                       ("d", "<f2")]), count=nb)
    sb = rec["scales"].astype(np.uint8)                # [nb, 12]
    sc = np.empty((nb, 16), np.int32)
    for i in range(4):
        sc[:, i] = (sb[:, i] & 0xF) | (((sb[:, 8 + i] >> 0) & 3) << 4)
        sc[:, 4 + i] = (sb[:, 4 + i] & 0xF) | (((sb[:, 8 + i] >> 2) & 3) << 4)
        sc[:, 8 + i] = (sb[:, i] >> 4) | (((sb[:, 8 + i] >> 4) & 3) << 4)
        sc[:, 12 + i] = (sb[:, 4 + i] >> 4) | (((sb[:, 8 + i] >> 6) & 3) << 4)
    qs = rec["qs"].reshape(nb, 2, 1, 2, 16)
    shifts = (2 * np.arange(4)).reshape(1, 1, 4, 1, 1)
    q = ((qs >> shifts) & 3).astype(np.float32)        # [nb,n,j,h,16]
    hm = rec["hmask"].reshape(nb, 1, 1, 2, 16)
    bit = (4 * np.arange(2).reshape(2, 1) +
           np.arange(4).reshape(1, 4)).reshape(1, 2, 4, 1, 1)
    hbit = ((hm >> bit) & 1).astype(np.float32)
    qv = q - 4.0 * (1.0 - hbit)
    scv = (sc.reshape(nb, 2, 4, 2) - 32).astype(np.float32)
    d = _f32(rec["d"]).reshape(nb, 1, 1, 1, 1)
    return (d * scv[..., None] * qv).reshape(-1)


def _dequant_q4_k(raw: bytes, nb: int) -> np.ndarray:
    """Q4_K: 8 groups of 32, 6-bit scale/min pairs; w = d*sc*q - dmin*m,
    q 4-bit. 144 B/superblock."""
    rec = np.frombuffer(raw, np.dtype([("d", "<f2"), ("dmin", "<f2"),
                                       ("scales", "u1", 12),
                                       ("qs", "u1", 128)]), count=nb)
    sc, mn = _scale_min_k4(rec["scales"])
    qs = rec["qs"].reshape(nb, 4, 32)
    lo = qs & 0xF
    hi = qs >> 4
    # group 2j <- low nibbles of span j, group 2j+1 <- high nibbles
    q = np.stack([lo, hi], axis=2).reshape(nb, 8, 32).astype(np.float32)
    d = _f32(rec["d"])[:, None, None]
    dmin = _f32(rec["dmin"])[:, None, None]
    return (d * sc[:, :, None] * q -
            dmin * mn[:, :, None]).reshape(-1)


def _dequant_q5_k(raw: bytes, nb: int) -> np.ndarray:
    """Q5_K: Q4_K + one high bit per element from qh. 176 B/superblock."""
    rec = np.frombuffer(raw, np.dtype([("d", "<f2"), ("dmin", "<f2"),
                                       ("scales", "u1", 12),
                                       ("qh", "u1", 32),
                                       ("qs", "u1", 128)]), count=nb)
    sc, mn = _scale_min_k4(rec["scales"])
    qs = rec["qs"].reshape(nb, 4, 32)
    qh = rec["qh"][:, None, :]                         # [nb, 1, 32]
    jj = np.arange(4)[None, :, None]
    lo = (qs & 0xF) + (((qh >> (2 * jj)) & 1) << 4)
    hi = (qs >> 4) + (((qh >> (2 * jj + 1)) & 1) << 4)
    q = np.stack([lo, hi], axis=2).reshape(nb, 8, 32).astype(np.float32)
    d = _f32(rec["d"])[:, None, None]
    dmin = _f32(rec["dmin"])[:, None, None]
    return (d * sc[:, :, None] * q -
            dmin * mn[:, :, None]).reshape(-1)


def _dequant_q6_k(raw: bytes, nb: int) -> np.ndarray:
    """Q6_K: 16 groups of 16, int8 scales; w = d*sc*(q-32), q = 4 low
    bits (ql) + 2 high bits (qh). 210 B/superblock."""
    rec = np.frombuffer(raw, np.dtype([("ql", "u1", 128),
                                       ("qh", "u1", 64),
                                       ("scales", "i1", 16),
                                       ("d", "<f2")]), count=nb)
    ql = rec["ql"].reshape(nb, 2, 2, 32)               # [nb, half, l/l+32, 32]
    qh = rec["qh"].reshape(nb, 2, 32)
    q1 = (ql[:, :, 0] & 0xF) | (((qh >> 0) & 3) << 4)
    q2 = (ql[:, :, 1] & 0xF) | (((qh >> 2) & 3) << 4)
    q3 = (ql[:, :, 0] >> 4) | (((qh >> 4) & 3) << 4)
    q4 = (ql[:, :, 1] >> 4) | (((qh >> 6) & 3) << 4)
    q = np.stack([q1, q2, q3, q4], axis=2).astype(np.float32) - 32.0
    sc = rec["scales"].reshape(nb, 2, 4, 2).astype(np.float32)
    d = _f32(rec["d"]).reshape(nb, 1, 1, 1, 1)
    return (d * sc[..., None] *
            q.reshape(nb, 2, 4, 2, 16)).reshape(-1)


_KDEQUANT = {GGML_Q2_K: _dequant_q2_k, GGML_Q3_K: _dequant_q3_k,
             GGML_Q4_K: _dequant_q4_k, GGML_Q5_K: _dequant_q5_k,
             GGML_Q6_K: _dequant_q6_k}

_TYPE_BYTES = {GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
               GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20),
               GGML_Q8_0: (32, 34),
               GGML_Q2_K: (256, 84), GGML_Q3_K: (256, 110),
               GGML_Q4_K: (256, 144), GGML_Q5_K: (256, 176),
               GGML_Q6_K: (256, 210)}


def parse_gguf(path: str):
    """-> (metadata dict, {name: np.ndarray float32 [out, in]-style})."""
    meta: dict[str, Any] = {}
    infos = []
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        assert magic == _MAGIC, f"not a GGUF file: {path}"
        assert version in (2, 3), f"gguf version {version}"
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype, ) = struct.unpack("<I", f.read(4))
            meta[key] = _read_value(f, vtype)
        for _ in range(n_tensors):
            name = _read_str(f)
            (nd, ) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
            ttype, off = struct.unpack("<IQ", f.read(12))
            infos.append((name, dims, ttype, off))
        align = int(meta.get("general.alignment", 32))
        base = (f.tell() + align - 1) // align * align
        tensors = {}
        for name, dims, ttype, off in infos:
            n = int(np.prod(dims))
            blk, bbytes = _TYPE_BYTES.get(ttype, (None, None))
            if blk is None:
                raise NotImplementedError(
                    f"gguf tensor type {ttype} ({name})")
            nbytes = n // blk * bbytes
            f.seek(base + off)
            flat = _dequant(f.read(nbytes), ttype, n)
            # ggml dims[0] is fastest (in-features): numpy shape is the
            # reverse — [out, in] for 2-D weights, HF/torch order.
            tensors[name] = flat.reshape(tuple(reversed(dims)))
    return meta, tensors


def model_config_from_gguf(path: str, max_model_len=None,
                           dtype: str = "bfloat16") -> ModelConfig:
    meta, _ = _parse_header_only(path)
    arch = meta.get("general.architecture")
    assert arch == "llama", f"gguf architecture {arch!r} (llama only)"
    p = f"{arch}."
    ctx = int(meta.get(p + "context_length", 2048))
    heads = int(meta[p + "attention.head_count"])
    cfg = ModelConfig(
        model=path,
        architecture="LlamaForCausalLM",
        vocab_size=len(meta.get("tokenizer.ggml.tokens", [])) or
        int(meta.get(p + "vocab_size", 32000)),
        hidden_size=int(meta[p + "embedding_length"]),
        intermediate_size=int(meta[p + "feed_forward_length"]),
        num_layers=int(meta[p + "block_count"]),
        num_heads=heads,
        num_kv_heads=int(meta.get(p + "attention.head_count_kv", heads)),
        rope_theta=float(meta.get(p + "rope.freq_base", 10000.0)),
        rms_norm_eps=float(
            meta.get(p + "attention.layer_norm_rms_epsilon", 1e-5)),
        max_model_len=min(max_model_len or ctx, ctx),
        dtype=dtype,
    )
    cfg.eos_token_ids = []  # type: ignore[attr-defined]
    eos = meta.get("tokenizer.ggml.eos_token_id")
    if eos is not None:
        cfg.eos_token_ids = [int(eos)]  # type: ignore[attr-defined]
    return cfg


def _parse_header_only(path: str):
    """Metadata + tensor infos without reading tensor data."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        assert magic == _MAGIC, f"not a GGUF file: {path}"
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        meta = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype, ) = struct.unpack("<I", f.read(4))
            meta[key] = _read_value(f, vtype)
        return meta, n_tensors


# llama.cpp tensor name -> our leaf path
_MAP = {
    "token_embd.weight": ("embed_tokens", "weight"),
    "output_norm.weight": ("norm", None),
    "output.weight": ("lm_head", "weight"),
}
_BLK = {
    "attn_norm.weight": ("input_layernorm", None),
    "ffn_norm.weight": ("post_attention_layernorm", None),
    "attn_q.weight": ("qkv_proj", 0),
    "attn_k.weight": ("qkv_proj", 1),
    "attn_v.weight": ("qkv_proj", 2),
    "attn_output.weight": ("o_proj", "weight"),
    "ffn_gate.weight": ("gate_up_proj", 0),
    "ffn_up.weight": ("gate_up_proj", 1),
    "ffn_down.weight": ("down_proj", "weight"),
}


def load_gguf_params(path: str, cfg: ModelConfig) -> dict:
    """GGUF -> the llama param pytree (dense bf16; re-quantize online
    for the fused serving kernels)."""
    import jax.numpy as jnp
    dt = jnp.dtype(cfg.dtype)
    _, tensors = parse_gguf(path)
    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"layers": layers}
    fused: dict[tuple[int, str], dict[int, np.ndarray]] = {}
    for name, w in tensors.items():
        if name in _MAP:
            leaf, kind = _MAP[name]
            if kind is None:
                params[leaf] = jnp.asarray(w).astype(dt)
            elif leaf == "embed_tokens":
                params[leaf] = {"weight": jnp.asarray(w).astype(dt)}
            else:  # lm_head: [out, in] -> [in, out]
                params[leaf] = {"weight": jnp.asarray(w.T).astype(dt)}
            continue
        if name.startswith("blk."):
            _, idx_s, rest = name.split(".", 2)
            li = int(idx_s)
            if rest not in _BLK:
                logger.warning("unmapped gguf tensor %s", name)
                continue
            leaf, kind = _BLK[rest]
            if kind is None:
                layers[li][leaf] = jnp.asarray(w).astype(dt)
            elif kind == "weight":
                layers[li][leaf] = {
                    "weight": jnp.asarray(w.T).astype(dt)}
            else:
                fused.setdefault((li, leaf), {})[kind] = w
            continue
        if name.startswith(("rope_freqs", "rope_factors")):
            continue  # computed, not loaded
        logger.warning("unmapped gguf tensor %s", name)
    for (li, leaf), parts in fused.items():
        n = 3 if leaf == "qkv_proj" else 2
        ws = [parts[i] for i in range(n)]
        layers[li][leaf] = {
            "weight": jnp.asarray(
                np.concatenate([p.T for p in ws], axis=1)).astype(dt)}
    if cfg.tie_word_embeddings and "lm_head" not in params:
        pass  # tied: compute_logits uses embed_tokens
    return params
