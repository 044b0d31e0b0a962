"""Persistent compilation cache: config-keyed on-disk XLA executables.

Ref analog: vllm/compilation/caching.py (compilation artifact cache) +
CompilerManager.load/save (vllm/compilation/backends.py:124) — the
reference hashes the compilation config and model factors and reuses
serialized compiled artifacts across process starts. On TPU the same
capability is JAX's persistent compilation cache: every jitted program
is keyed by (HLO, compile options, jaxlib/runtime version) and the
serialized executable is written under ``jax_compilation_cache_dir``.

We scope the directory per engine-config hash (``EngineConfig.
compile_key()``) so unrelated configs don't churn one directory's
eviction, and drop JAX's default write thresholds so the many small
bucket programs (a few hundred ms of compile each) are cached too —
warmup is dominated by their count, not by one big program.

The cache is best-effort: backends that cannot serialize executables
(some PJRT plugins) make JAX log a warning and compile as usual.
"""

from __future__ import annotations

import os
from typing import Optional

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_enabled_dir: Optional[str] = None


def enable_compile_cache(config=None,
                         cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a config-keyed dir.

    Returns the directory in use, or None when disabled. Idempotent;
    the last call wins (JAX reads the config at compile time).

    Disable with ``VLLM_TPU_COMPILE_CACHE=0`` (or ``off``/``none``).
    """
    global _enabled_dir
    from vllm_tpu import envs
    raw = cache_dir if cache_dir is not None else envs.VLLM_TPU_COMPILE_CACHE
    if raw is None or str(raw).lower() in ("0", "off", "none", "false", ""):
        return None
    base = os.path.expanduser(str(raw))

    import jax
    key = config.compile_key() if config is not None else "global"
    path = os.path.join(base, f"jax{jax.__version__}-{key}")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:
        logger.warning("compile cache disabled (cannot create %s: %s)",
                       path, e)
        return None

    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Default thresholds skip programs that compile in <1s / serialize
    # small; the warmup ladder is ~40 such programs, so cache them all.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        # Also persist XLA-internal (autotune etc.) caches when the
        # backend supports it; name exists on jax>=0.4.34.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
    if _enabled_dir != path:
        logger.info("persistent compile cache: %s", path)
    _enabled_dir = path
    return path


def cache_stats(path: Optional[str] = None) -> dict:
    """{entries, bytes} for the active (or given) cache directory."""
    path = path or _enabled_dir
    if not path or not os.path.isdir(path):
        return {"entries": 0, "bytes": 0}
    n = b = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                b += os.path.getsize(os.path.join(root, f))
                n += 1
            except OSError:
                pass
    return {"entries": n, "bytes": b}
