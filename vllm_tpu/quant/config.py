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
    if fmt in ("fp8", "int8", "w8a8_int8", "int4"):
        # Online quantization shorthands (quantize at load).
        return QuantizationConfig(method=fmt,
                                  bits=4 if fmt == "int4" else 8,
                                  raw=qcfg)  # type: ignore[arg-type]
    raise ValueError(f"unsupported quantization method: {fmt}")
