"""Native (C++) runtime components, built on demand with g++.

Ref analog: the reference's csrc/ tree (SURVEY §2.8). No pybind11 in
this image — C ABIs consumed via ctypes. Build products land next to
the sources (.so cached across runs; rebuild on source change).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.cc")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    so = os.path.join(_DIR, f"lib{name}.{tag}.so")
    if os.path.exists(so):
        return so
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o",
             so + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logger.warning("native build of %s failed (%s); Python "
                       "fallback in use", name, e)
        return None


_lib_cache: dict[str, Optional[ctypes.CDLL]] = {}


def load(name: str) -> Optional[ctypes.CDLL]:
    if name not in _lib_cache:
        so = _build(name)
        _lib_cache[name] = ctypes.CDLL(so) if so else None
    return _lib_cache[name]
