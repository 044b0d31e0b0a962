"""RL weight-sync transport: push updated weights into a serving
engine over ZMQ without restarting it.

Ref analog: vllm/distributed/weight_transfer/ (NCCL/IPC engines) +
EngineCore.set_weight_version (core.py:958) + reload_weights
(gpu_worker.py:456). TPU-native shape: the trainer pushes named host
tensors over a ZMQ REQ/REP socket (msgpack header + raw buffer
frames, the serial_utils tensor-frame idea); the engine thread
installs them in place — re-sharding over its mesh — and bumps the
weight version. Partial updates merge into the current pytree, so a
LoRA-sized delta doesn't resend the model.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

import msgpack
import numpy as np

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


def _dtype_str(a: np.ndarray) -> str:
    # bf16 numpy arrays come from ml_dtypes; name round-trips.
    return str(a.dtype)


def _to_np(dtype: str, shape, buf: bytes) -> np.ndarray:
    import ml_dtypes  # noqa: F401 — registers bfloat16 et al
    return np.frombuffer(buf, dtype=np.dtype(dtype)).reshape(shape)


def pack_update(flat: dict[str, np.ndarray], version: int) -> list[bytes]:
    """[header, buf...] multipart frames for one weight update."""
    header = {
        "type": "weight_update",
        "version": version,
        "tensors": [{
            "name": k,
            "dtype": _dtype_str(v),
            "shape": list(v.shape),
        } for k, v in flat.items()],
    }
    frames = [msgpack.packb(header)]
    frames += [np.ascontiguousarray(v).tobytes() for v in flat.values()]
    return frames


def unpack_update(frames: list[bytes]) -> tuple[dict[str, np.ndarray], int]:
    header = msgpack.unpackb(frames[0])
    assert header["type"] == "weight_update", header["type"]
    flat = {
        t["name"]: _to_np(t["dtype"], t["shape"], frames[1 + i])
        for i, t in enumerate(header["tensors"])
    }
    return flat, int(header["version"])


class WeightTransferClient:
    """Trainer-side: push a (partial) param pytree to a serving
    engine."""

    def __init__(self, addr: str) -> None:
        import zmq
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.connect(addr)

    def push(self, params_or_flat, version: int,
             timeout_ms: int = 60_000) -> dict[str, Any]:
        from vllm_tpu.engine.state import flatten_params
        flat = (params_or_flat if isinstance(params_or_flat, dict)
                and all(isinstance(k, str) for k in params_or_flat)
                and not any(isinstance(v, dict)
                            for v in params_or_flat.values())
                else flatten_params(params_or_flat))
        flat = {k: np.asarray(v) for k, v in flat.items()}
        self._sock.send_multipart(pack_update(flat, version))
        if self._sock.poll(timeout_ms) == 0:
            raise TimeoutError("weight push not acked")
        return msgpack.unpackb(self._sock.recv())

    def close(self) -> None:
        self._sock.close(0)


class WeightTransferServer:
    """Engine-side: receive weight updates on a background thread and
    install them between engine steps (the installer runs under the
    caller-provided ``apply`` callback, which must be thread-safe
    w.r.t. the engine loop — AsyncLLM routes it through the request
    queue)."""

    def __init__(self, addr: str, apply_fn) -> None:
        import zmq
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        self._sock.bind(addr)
        self._apply = apply_fn
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop,
                                        name="weight-transfer",
                                        daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        import zmq
        while not self._stop.is_set():
            if self._sock.poll(100) == 0:
                continue
            try:
                frames = self._sock.recv_multipart()
                flat, version = unpack_update(frames)
                self._apply(flat, version)
                self._sock.send(msgpack.packb({
                    "ok": True,
                    "version": version,
                    "num_tensors": len(flat),
                }))
            except zmq.ZMQError:
                break
            except Exception as e:  # noqa: BLE001 — report to pusher
                logger.exception("weight update failed")
                try:
                    self._sock.send(msgpack.packb({
                        "ok": False, "error": str(e)}))
                except Exception:  # noqa: BLE001
                    pass

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._sock.close(0)


def apply_weight_update(engine, flat: dict[str, np.ndarray],
                        version: int) -> None:
    """Merge a flat {dotted.path: array} update into the engine's
    live params (in place: unknown names raise; re-shards over the
    engine mesh when present) and bump the weight version."""
    import jax
    import jax.numpy as jnp
    from vllm_tpu.engine.state import _SEP, unflatten_params
    runner = engine.runner

    # Device-resident flatten (state.flatten_params fetches to host —
    # a partial update must not round-trip the whole model).
    cur: dict[str, Any] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        else:
            cur[_SEP.join(path)] = node

    walk(runner.params, [])
    unknown = set(flat) - set(cur)
    if unknown:
        raise KeyError(f"unknown weight names: {sorted(unknown)[:5]}")
    staged = dict(cur)
    for name, arr in flat.items():
        old = cur[name]
        if tuple(arr.shape) != tuple(old.shape):
            raise ValueError(
                f"{name}: shape {arr.shape} != {tuple(old.shape)}")
        new = jnp.asarray(arr).astype(old.dtype)
        if hasattr(old, "sharding"):
            new = jax.device_put(new, old.sharding)
        staged[name] = new
    runner.params = unflatten_params(staged)
    engine.weight_version = version
    logger.info("weights updated to version %s (%d tensors)", version,
                len(flat))
