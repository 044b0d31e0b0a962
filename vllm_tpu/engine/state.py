"""Engine state management: sleep/wake + param save/restore.

Ref analogs:
- sleep mode: CuMemAllocator.sleep():229/wake_up():283 (cumem.py) +
  engine sleep()/wake_up() (core.py:864-922). TPU-native: weights are
  device_get to host RAM (level 1) or discarded (level 2); KV caches
  are always discarded (their contents are recomputable); deleting the
  jax.Arrays frees HBM.
- sharded save/restore: Worker.save_sharded_state (gpu_worker.py:1190)
  + ShardedStateLoader (sharded_state_loader.py:29). The param pytree
  flattens to path-keyed tensors in a safetensors file; reload
  re-applies the mesh shardings.
- reload_weights (gpu_worker.py:456): RL-style in-place weight refresh
  from a new checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_SEP = "::"


def flatten_params(params) -> dict[str, np.ndarray]:
    """Pytree -> {path: numpy} (jax arrays fetched to host)."""
    import jax
    flat: dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        else:
            flat[_SEP.join(path)] = np.asarray(jax.device_get(node))

    walk(params, [])
    return flat


def unflatten_params(flat: dict[str, np.ndarray]):
    """Inverse of flatten_params (lists recognized by integer keys)."""
    root: dict = {}
    for path, arr in flat.items():
        keys = path.split(_SEP)
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [fix(node[str(i)]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_state(params, path: str) -> None:
    """Save the param pytree to a safetensors file."""
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = flatten_params(params)
    # safetensors cannot store bf16 via numpy: view as uint16 and
    # remember the dtype in metadata.
    meta = {}
    packed = {}
    for k, v in flat.items():
        if v.dtype.name == "bfloat16":
            meta[k] = "bfloat16"
            packed[k] = v.view(np.uint16)
        elif v.dtype.name == "float8_e4m3fn":
            meta[k] = "float8_e4m3fn"
            packed[k] = v.view(np.uint8)
        else:
            packed[k] = v
    save_file(packed, path, metadata=meta or None)
    logger.info("saved %d tensors to %s", len(packed), path)


def load_state(path: str):
    """Load a pytree saved by save_state (host numpy leaves)."""
    import ml_dtypes
    from safetensors import safe_open
    flat: dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        for k in f.keys():
            arr = f.get_tensor(k)
            dt = meta.get(k)
            if dt == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16)
            elif dt == "float8_e4m3fn":
                arr = arr.view(ml_dtypes.float8_e4m3fn)
            flat[k] = arr
    return unflatten_params(flat)


class SleepManager:
    """Owns the engine's sleep/wake transitions."""

    def __init__(self, engine) -> None:
        self.engine = engine
        self.level: int = 0
        self._host_params: Optional[dict] = None

    @property
    def is_sleeping(self) -> bool:
        return self.level > 0

    def sleep(self, level: int = 1) -> None:
        assert level in (1, 2)
        assert not self.engine.has_unfinished_requests(), (
            "cannot sleep with in-flight requests")
        runner = self.engine.runner
        if level == 1:
            self._host_params = flatten_params(runner.params)
        # Drop device references; jax frees HBM once unreferenced.
        runner.params = None
        runner.kv_caches = None
        self.level = level
        logger.info("engine sleeping (level %d)", level)

    def wake_up(self) -> None:
        import jax
        import jax.numpy as jnp
        from vllm_tpu.ops.kv_cache import make_kv_cache
        assert self.level > 0
        engine = self.engine
        runner = engine.runner
        if self.level == 1:
            host = self._host_params
            assert host is not None
            params = unflatten_params(
                {k: jnp.asarray(v) for k, v in host.items()})
            self._host_params = None
        else:
            params = engine._load_params()
        if runner.mesh is not None:
            from vllm_tpu.parallel.shard import shard_params
            params = shard_params(params, engine.config.model,
                                  runner.mesh)
        runner.params = params
        # Fresh (zeroed) KV caches; the prefix cache bookkeeping was
        # already empty (no in-flight requests, blocks freed), but any
        # cached prefixes must be dropped since their data is gone.
        mc = engine.config.model
        cc = engine.config.cache
        num_blocks = engine.scheduler.kv_cache_manager.block_pool.num_blocks
        kv_sh = None
        if runner.mesh is not None:
            from vllm_tpu.parallel.shard import kv_cache_sharding
            kv_sh = kv_cache_sharding(mc, runner.mesh)
        runner.kv_caches = [
            make_kv_cache(num_blocks, cc.block_size, mc.num_kv_heads,
                          mc.head_dim, cc.cache_dtype, mc.dtype,
                          sharding=kv_sh) for _ in range(mc.num_layers)
        ]
        engine.scheduler.kv_cache_manager.reset_prefix_cache()
        self.level = 0
        logger.info("engine awake")
