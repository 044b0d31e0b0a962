"""Quantization config detection from checkpoint metadata.

Ref analog: vllm/model_executor/layers/quantization/__init__.py
(get_quantization_config:109) + auto_gptq.py/auto_awq.py/inc config
parsing — we read the checkpoint's ``quantization_config`` block in
config.json and resolve a scheme.
"""

from __future__ import annotations

import json
import os

from vllm_tpu.config import QuantizationConfig


def detect_quant_config(model_path: str,
                        method_hint: str | None = None) -> QuantizationConfig:
    cfg_path = os.path.join(model_path, "config.json")
    qcfg: dict = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            qcfg = json.load(f).get("quantization_config", {}) or {}

    fmt = (qcfg.get("quant_method") or method_hint or "").lower()
    if fmt in ("", "none"):
        return QuantizationConfig(method=None)

    if fmt in ("gptq", "awq", "auto-round", "auto_round"):
        method = {"auto-round": "auto_round"}.get(fmt, fmt)
        return QuantizationConfig(
            method=method,  # type: ignore[arg-type]
            bits=int(qcfg.get("bits", 4)),
            group_size=int(qcfg.get("group_size", 128)),
            sym=bool(qcfg.get("sym", not qcfg.get("zero_point", False))
                     if fmt != "awq" else False),
            desc_act=bool(qcfg.get("desc_act", False)),
            lm_head_quantized=bool(qcfg.get("lm_head", False)),
            raw=qcfg,
        )
    if fmt == "compressed-tensors":
        return _parse_compressed_tensors(qcfg)
    if fmt == "bitsandbytes":
        # Pre-quantized bnb checkpoints (ref:
        # model_loader/bitsandbytes_loader.py). 4-bit NF4 maps onto
        # the NF4 codebook leaf; int8 (LLM.int8) is not wired.
        if qcfg.get("load_in_8bit"):
            raise ValueError("bitsandbytes 8-bit checkpoints are not "
                             "supported (use an int8 online quant)")
        if qcfg.get("bnb_4bit_quant_type", "nf4") != "nf4":
            raise ValueError("bitsandbytes fp4 checkpoints are not "
                             "supported (nf4 only)")
        return QuantizationConfig(method="bnb4", bits=4, raw=qcfg)
    if fmt == "fp8" and qcfg:
        # Checkpoint FP8 (scales serialized; ref: quantization/fp8.py).
        # Bare "fp8" via method_hint stays the online shorthand below.
        return QuantizationConfig(method="fp8_ckpt", bits=8, raw=qcfg)
    if fmt in ("fp8", "int8", "w8a8_int8", "int4"):
        # Online quantization shorthands (quantize at load).
        return QuantizationConfig(method=fmt,
                                  bits=4 if fmt == "int4" else 8,
                                  raw=qcfg)  # type: ignore[arg-type]
    raise ValueError(f"unsupported quantization method: {fmt}")


def _parse_compressed_tensors(qcfg: dict) -> QuantizationConfig:
    """llm-compressor config_groups -> scheme (ref:
    compressed_tensors.py get_scheme; we support one uniform group)."""
    groups = qcfg.get("config_groups") or {}
    if not groups:
        raise ValueError("compressed-tensors config without config_groups")
    spec = next(iter(groups.values()))
    w = spec.get("weights") or {}
    bits = int(w.get("num_bits", 4))
    wtype = w.get("type", "int")
    strategy = w.get("strategy", "group")
    sym = bool(w.get("symmetric", True))
    group_size = int(w.get("group_size") or 0) or 128
    fmt = qcfg.get("format", "")
    acts = spec.get("input_activations")
    if fmt == "pack-quantized" or (wtype == "int" and acts is None):
        return QuantizationConfig(method="ct_wna16", bits=bits,
                                  group_size=(group_size
                                              if strategy == "group"
                                              else 0),
                                  sym=sym, raw=qcfg)
    if wtype == "int":
        return QuantizationConfig(method="ct_w8a8_int8", bits=8,
                                  sym=sym, raw=qcfg)
    if wtype == "float":
        return QuantizationConfig(method="ct_fp8", bits=8, sym=True,
                                  raw=qcfg)
    raise ValueError(f"unsupported compressed-tensors scheme: {spec}")
