"""Engine-core clients over the ZMQ protocol.

Ref analog: vllm/v1/engine/core_client.py (EngineCoreClient hierarchy:
Inproc/SyncMP/AsyncMP). ``ZmqSyncClient`` is the blocking variant;
``ZmqAsyncClient`` integrates with asyncio for the serving frontend.
"""

from __future__ import annotations

import asyncio
import threading
from typing import Callable, Optional

import zmq

from vllm_tpu.engine import protocol as proto
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


class ZmqSyncClient:

    def __init__(self, input_addr: str, output_addr: str,
                 ready_timeout_s: float = 60.0) -> None:
        self.ctx = zmq.Context()
        self.input_sock = self.ctx.socket(zmq.PUSH)
        self.input_sock.connect(input_addr)
        self.output_sock = self.ctx.socket(zmq.PULL)
        self.output_sock.connect(output_addr)
        # Engine readiness handshake (ref analog:
        # VLLM_ENGINE_READY_TIMEOUT_S, envs.py:27).
        if not self.output_sock.poll(int(ready_timeout_s * 1000)):
            raise TimeoutError("engine core did not become ready")
        msg_type, _ = proto.decode(self.output_sock.recv())
        assert msg_type == proto.READY, msg_type

    def add_request(self, request_id: str, prompt_token_ids: list[int],
                    params: SamplingParams, priority: int = 0,
                    lora_name: Optional[str] = None) -> None:
        self.input_sock.send(
            proto.encode(
                proto.ADD,
                proto.WireRequest.from_params(request_id, prompt_token_ids,
                                              params, priority, lora_name)))

    def add_lora(self, name: str, path: str) -> None:
        """Register a PEFT adapter on the remote engine core."""
        self.input_sock.send(
            proto.encode(proto.ADD_LORA, {"name": name, "path": path}))

    def abort_requests(self, request_ids: list[str]) -> None:
        self.input_sock.send(
            proto.encode(proto.ABORT, {"request_ids": request_ids}))

    def recv_outputs(self,
                     timeout_ms: int = 1000) -> list[proto.WireOutput]:
        if not self.output_sock.poll(timeout_ms):
            return []
        msg_type, body = proto.decode(self.output_sock.recv())
        assert msg_type == proto.OUTPUTS
        return [proto.WireOutput(**o) for o in body]

    def shutdown_engine(self) -> None:
        self.input_sock.send(proto.encode(proto.SHUTDOWN, {}))

    def close(self) -> None:
        self.input_sock.close(0)
        self.output_sock.close(0)
        self.ctx.term()


class ZmqAsyncClient:
    """asyncio wrapper: a reader thread feeds per-request queues."""

    def __init__(self, input_addr: str, output_addr: str) -> None:
        self.sync = ZmqSyncClient(input_addr, output_addr)
        self.queues: dict[str, asyncio.Queue] = {}
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._stop = threading.Event()
        self._reader = threading.Thread(target=self._read_loop,
                                        daemon=True)

    def start(self) -> None:
        self._loop = asyncio.get_running_loop()
        self._reader.start()

    def _read_loop(self) -> None:
        while not self._stop.is_set():
            for out in self.sync.recv_outputs(timeout_ms=100):
                q = self.queues.get(out.request_id)
                if q is not None and self._loop is not None:
                    self._loop.call_soon_threadsafe(q.put_nowait, out)

    async def generate(self, request_id: str, prompt_token_ids: list[int],
                       params: SamplingParams):
        q: asyncio.Queue = asyncio.Queue()
        self.queues[request_id] = q
        self.sync.add_request(request_id, prompt_token_ids, params)
        try:
            while True:
                out = await q.get()
                yield out
                if out.finished:
                    return
        finally:
            self.queues.pop(request_id, None)

    def close(self) -> None:
        self._stop.set()
        if self._reader.is_alive():
            self._reader.join(timeout=2)
        self.sync.close()
