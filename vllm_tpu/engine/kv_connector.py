"""Disaggregated prefill/decode KV transfer over ZMQ.

Ref analog: vllm/distributed/kv_transfer/kv_connector/v1/base.py:171
(KVConnectorBase_V1 scheduler+worker roles) and the nixl/mooncake
transport workers (nixl/base_worker.py) — a prefill engine computes the
prompt's KV once and ships the blocks to a decode engine, which skips
prefill compute for the transferred region.  The reference moves blocks
over RDMA; on TPU the device->host gather already happens through the
runner (read_blocks), so the network hop is plain ZMQ multipart with
zero-copy numpy frames — the same transport the engine control plane
uses (engine/protocol.py).

Wire format (REQ/REP):
  request:  [msgpack {"type": "prefill", "request_id", "prompt_token_ids"}]
  reply:    [msgpack header, raw frame, raw frame, ...]
    header = {"num_tokens": int, "layers": [{"shape", "dtype"}...],
              "scales": null | [{"shape", "dtype"}...]}
    frames = one per layer data array, then one per layer scale array.

A reply with num_tokens == 0 means the prefill side had nothing cached
(the decode engine falls back to local prefill — correctness never
depends on the transfer)."""

from __future__ import annotations

import logging
import threading
from typing import Optional

import msgpack
import numpy as np

from vllm_tpu.core.kv_offload import KVTransferPayload

logger = logging.getLogger(__name__)


def serialize_payload(payload: Optional[KVTransferPayload]) -> list[bytes]:
    """Multipart frames: msgpack header + raw array bytes (no copies of
    the array data beyond the socket write)."""
    if payload is None:
        return [msgpack.packb({"num_tokens": 0})]
    header = {
        "num_tokens": payload.num_tokens,
        "layers": [{
            "shape": list(a.shape),
            "dtype": a.dtype.str,
        } for a in payload.data],
        "scales": None if payload.scales is None else [{
            "shape": list(a.shape),
            "dtype": a.dtype.str,
        } for a in payload.scales],
    }
    frames: list[bytes] = [msgpack.packb(header)]
    frames.extend(np.ascontiguousarray(a).data for a in payload.data)
    if payload.scales is not None:
        frames.extend(np.ascontiguousarray(a).data
                      for a in payload.scales)
    return frames


def deserialize_payload(frames: list[bytes]) \
        -> Optional[KVTransferPayload]:
    header = msgpack.unpackb(frames[0], raw=False)
    if header["num_tokens"] == 0:
        return None
    n_layers = len(header["layers"])
    data = [
        np.frombuffer(frames[1 + i], dtype=np.dtype(spec["dtype"]))
        .reshape(spec["shape"])
        for i, spec in enumerate(header["layers"])
    ]
    scales = None
    if header["scales"] is not None:
        scales = [
            np.frombuffer(frames[1 + n_layers + i],
                          dtype=np.dtype(spec["dtype"]))
            .reshape(spec["shape"])
            for i, spec in enumerate(header["scales"])
        ]
    return KVTransferPayload(num_tokens=header["num_tokens"], data=data,
                             scales=scales)


class KVPrefillServer:
    """Prefill-side endpoint: owns an engine, serves KV over ZMQ.

    For each request it runs the prompt through the engine (one token,
    greedy — enough to populate the content-addressed prefix cache),
    extracts the full-block KV and streams it back.  Requires
    enable_prefix_caching on the wrapped engine (extract_kv reads the
    content-addressed block cache)."""

    def __init__(self, engine, addr: str) -> None:
        import zmq
        assert engine.config.cache.enable_prefix_caching, (
            "KV prefill server needs prefix caching enabled")
        self.engine = engine
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.REP)
        self.sock.bind(addr)
        self.addr = addr
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def serve_once(self, timeout_ms: int = 1000) -> bool:
        """Handle one request; returns False on poll timeout."""
        import zmq
        if not self.sock.poll(timeout_ms, zmq.POLLIN):
            return False
        req = msgpack.unpackb(self.sock.recv(), raw=False)
        if req.get("type") == "ping":
            self.sock.send(msgpack.packb({"ok": True}))
            return True
        payload = self._prefill(req["prompt_token_ids"],
                                req.get("request_id", "kvx"))
        self.sock.send_multipart(serialize_payload(payload))
        return True

    def _prefill(self, prompt_token_ids: list[int],
                 request_id: str) -> Optional[KVTransferPayload]:
        from vllm_tpu.sample.params import SamplingParams
        try:
            rid = self.engine.add_request(
                list(prompt_token_ids),
                SamplingParams(temperature=0.0, max_tokens=1,
                               ignore_eos=True),
                request_id=f"prefill-{request_id}")
            while self.engine.has_unfinished_requests():
                self.engine.step()
            del rid
            return self.engine.extract_kv(list(prompt_token_ids))
        except Exception:  # noqa: BLE001 — never kill the serve loop
            logger.exception("prefill for %s failed", request_id)
            return None

    # -- background serving ------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.is_set():
            self.serve_once(timeout_ms=100)

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.sock.close(0)


class KVConnectorClient:
    """Decode-side client: fetch a prompt's KV from a prefill engine.

    Failures (timeout, connection refused, mismatched cache config)
    degrade to None — the decode engine prefills locally."""

    def __init__(self, addr: str, timeout_ms: int = 30000) -> None:
        import zmq
        self.ctx = zmq.Context.instance()
        self.addr = addr
        self.timeout_ms = timeout_ms
        self._lock = threading.Lock()
        self.sock = self._connect()

    def _connect(self):
        import zmq
        sock = self.ctx.socket(zmq.REQ)
        sock.setsockopt(zmq.RCVTIMEO, self.timeout_ms)
        sock.setsockopt(zmq.SNDTIMEO, self.timeout_ms)
        sock.setsockopt(zmq.LINGER, 0)
        sock.connect(self.addr)
        return sock

    def fetch(self, prompt_token_ids: list[int],
              request_id: str = "kvx") -> Optional[KVTransferPayload]:
        import zmq
        with self._lock:
            try:
                self.sock.send(msgpack.packb({
                    "type": "prefill",
                    "request_id": request_id,
                    "prompt_token_ids": list(prompt_token_ids),
                }))
                frames = self.sock.recv_multipart()
            except zmq.ZMQError:
                logger.warning("KV fetch from %s failed; falling back "
                               "to local prefill", self.addr)
                # REQ sockets wedge after an unanswered send.
                self.sock.close(0)
                self.sock = self._connect()
                return None
        return deserialize_payload(frames)

    def close(self) -> None:
        self.sock.close(0)
