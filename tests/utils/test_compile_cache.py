"""Persistent compile cache (utils/compile_cache.py).

Ref analog test surface: vllm's compilation artifact cache tests
(vllm/compilation/caching.py) — assert executables are serialized to
the config-keyed directory and reused.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from vllm_tpu.config import EngineConfig, ModelConfig
from vllm_tpu.utils.compile_cache import cache_stats, enable_compile_cache


@pytest.fixture
def _restore_jax_cache_config():
    keep = {
        n: jax.config._read(n) for n in (
            "jax_enable_compilation_cache",
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    yield
    for n, v in keep.items():
        jax.config.update(n, v)


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("VLLM_TPU_COMPILE_CACHE", "0")
    assert enable_compile_cache(EngineConfig()) is None


def test_writes_and_reuses_entries(tmp_path, _restore_jax_cache_config):
    cfg = EngineConfig(model=ModelConfig(hidden_size=96, num_layers=1))
    path = enable_compile_cache(cfg, cache_dir=str(tmp_path))
    assert path is not None and str(tmp_path) in path
    # Per-config keying: a different config hashes elsewhere.
    cfg2 = EngineConfig(model=ModelConfig(hidden_size=128, num_layers=1))
    path2 = enable_compile_cache(cfg2, cache_dir=str(tmp_path))
    assert path2 != path
    # Point back and compile something unique; an entry must land.
    enable_compile_cache(cfg, cache_dir=str(tmp_path))

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x.T * 3.17

    f(jnp.ones((17, 96), jnp.float32)).block_until_ready()
    st = cache_stats(path)
    assert st["entries"] >= 1 and st["bytes"] > 0, st
    # Same program again after dropping in-memory caches: still one
    # on-disk entry set (hit, not a second write of the same key).
    names0 = sorted(os.listdir(path))
    jax.clear_caches()
    f(jnp.ones((17, 96), jnp.float32)).block_until_ready()
    assert sorted(os.listdir(path)) == names0


def test_engine_init_respects_disable(monkeypatch, tmp_path):
    # Engine path goes through enable_compile_cache; with the env off
    # nothing is created under the default location.
    monkeypatch.setenv("VLLM_TPU_COMPILE_CACHE",
                       str(tmp_path / "should_not_exist_parent"))
    monkeypatch.setenv("VLLM_TPU_COMPILE_CACHE", "off")
    assert enable_compile_cache(EngineConfig()) is None
