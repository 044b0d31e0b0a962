"""Typed, lazily-evaluated environment variables.

Ref analog: vllm/envs.py (863 lazily-evaluated ``VLLM_*`` vars behind a
module-level ``__getattr__``). Every ``VLLM_TPU_*`` knob is declared
here with a type and default; reads go through attribute access
(``envs.VLLM_TPU_ATTN_BACKEND``) so values are parsed once per lookup,
respect runtime ``os.environ`` changes, and typos fail loudly.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional


def _bool(v: str) -> bool:
    return v.lower() in ("1", "true", "yes", "on")


def _choice(*allowed: str) -> Callable[[str], str]:
    def parse(v: str) -> str:
        if v not in allowed:
            raise ValueError(f"expected one of {allowed}, got {v!r}")
        return v
    return parse


# name -> (parser, default). None default = unset.
_VARS: dict[str, tuple[Callable[[str], Any], Any]] = {
    # Attention backend override (ops/dispatch.py).
    "VLLM_TPU_ATTN_BACKEND": (_choice("pallas", "xla"), None),
    # Use the native C++ block pool (core/native_pool.py). Default on;
    # falls back to the Python pool when the shared lib can't build.
    "VLLM_TPU_NATIVE_POOL": (_bool, True),
    # Persistent XLA compile cache dir (utils/compile_cache.py);
    # "0"/"off" disables. Keyed per engine-config hash underneath.
    "VLLM_TPU_COMPILE_CACHE": (str, "~/.cache/vllm_tpu/jit_cache"),
    # Logging level for vllm_tpu loggers.
    "VLLM_TPU_LOG_LEVEL": (str, "INFO"),
    # OTel-style span export file (tracing.py).
    "VLLM_TPU_TRACE_FILE": (str, None),
    # jax.profiler dump directory for /profile endpoints (tracing.py).
    "VLLM_TPU_PROFILE_DIR": (str, "/tmp/vllm_tpu_profile"),
    # Engine-protocol socket override (entrypoints).
    "VLLM_TPU_ENGINE_ADDR": (str, None),
    # Multi-host fault tolerance (ref analog: engine_core_sentinel
    # timeouts, vllm envs.py VLLM_ENGINE_READY_TIMEOUT_S).
    "VLLM_TPU_MH_HEARTBEAT_S": (float, 1.0),
    "VLLM_TPU_MH_WORKER_TIMEOUT_S": (float, 10.0),
    "VLLM_TPU_MH_HEAD_TIMEOUT_S": (float, 60.0),
    # bench.py knobs.
    "VLLM_TPU_BENCH_MODEL": (str, "8b"),
    "VLLM_TPU_BENCH_QUANT": (str, None),
    "VLLM_TPU_BENCH_HORIZON": (int, 64),
    "VLLM_TPU_BENCH_PROFILE": (str, None),
    # Multi-step decode horizon override (engine).
    "VLLM_TPU_DECODE_HORIZON": (int, None),
    # Dual-batch overlap in the EP MoE path (ops/moe._ep_moe): split
    # tokens into two micro-batches so one's combine collective rides
    # the ICI while the other's expert GEMMs run (ref analog:
    # vllm/v1/worker/ubatching.py + docs/design/dbo.md).
    "VLLM_TPU_MOE_DBO": (_bool, True),
    # JSON dict of XLA compiler options applied to the runner's jitted
    # programs (e.g. '{"xla_tpu_scoped_vmem_limit_kib":"65536"}') —
    # the TPU analog of the reference's compilation-config knobs.
    "VLLM_TPU_XLA_OPTS": (__import__("json").loads, None),
}


def __getattr__(name: str) -> Any:
    try:
        parse, default = _VARS[name]
    except KeyError:
        raise AttributeError(
            f"unknown env var {name}; known: {sorted(_VARS)}") from None
    raw = os.environ.get(name)
    if raw is None:
        return default
    return parse(raw)


def __dir__() -> list[str]:
    return sorted(_VARS)


def is_set(name: str) -> bool:
    """True when the variable is explicitly present in the process
    environment (vs falling back to its default)."""
    if name not in _VARS:
        raise AttributeError(f"unknown env var {name}")
    return name in os.environ


def describe() -> dict[str, Optional[str]]:
    """{name: current-raw-value-or-None} for collect-env output."""
    return {n: os.environ.get(n) for n in sorted(_VARS)}
