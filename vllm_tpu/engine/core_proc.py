"""EngineCoreProc: the engine core behind the ZMQ boundary, plus a
mock engine for frontend tests.

Ref analog: vllm/v1/engine/core.py EngineCoreProc:1004 (busy loop,
input/output queues over ZMQ) and rust/src/mock-engine (a fake engine
speaking the real protocol so the whole serving frontend is testable
with no device).
"""

from __future__ import annotations

import threading
from typing import Optional

import zmq

from vllm_tpu.engine import protocol as proto
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


class EngineCoreProc:
    """Runs a real LLMEngine; input PULL socket, output PUSH socket."""

    def __init__(self, config, input_addr: str, output_addr: str,
                 params=None, tokenizer=None) -> None:
        from vllm_tpu.engine.llm_engine import LLMEngine
        self.engine = LLMEngine(config, params=params, tokenizer=tokenizer)
        self.ctx = zmq.Context()
        self.input_sock = self.ctx.socket(zmq.PULL)
        self.input_sock.bind(input_addr)
        self.output_sock = self.ctx.socket(zmq.PUSH)
        self.output_sock.bind(output_addr)
        self._running = True
        # request_id -> tokens already streamed (a step can emit
        # several tokens: multi-step decode horizon, accepted drafts).
        self._emitted: dict[str, int] = {}

    def run_busy_loop(self) -> None:
        self.output_sock.send(proto.encode(proto.READY, {}))
        while self._running:
            timeout = 0 if self.engine.has_unfinished_requests() else 50
            while self.input_sock.poll(timeout):
                msg_type, body = proto.decode(self.input_sock.recv())
                if msg_type == proto.ADD:
                    req = proto.WireRequest(**body)
                    self.engine.add_request(req.prompt_token_ids,
                                            req.to_sampling_params(),
                                            req.request_id,
                                            priority=req.priority,
                                            lora_name=req.lora_name)
                elif msg_type == proto.ADD_LORA:
                    self.engine.add_lora(body["name"], body["path"])
                elif msg_type == proto.ABORT:
                    self.engine.abort_request(body["request_ids"])
                    for rid in body["request_ids"]:
                        self._emitted.pop(rid, None)
                elif msg_type == proto.SHUTDOWN:
                    self._running = False
                timeout = 0
            if not self._running:
                break
            if self.engine.has_unfinished_requests():
                outs = self.engine.step()
                if outs:
                    wire = []
                    for o in outs:
                        toks = list(o.outputs[0].token_ids)
                        if o.finished:
                            # Full final list: the client reconciles.
                            new = toks
                            self._emitted.pop(o.request_id, None)
                        else:
                            sent = self._emitted.get(o.request_id, 0)
                            new = toks[sent:]
                            self._emitted[o.request_id] = len(toks)
                        wire.append(
                            proto.WireOutput(
                                request_id=o.request_id,
                                new_token_ids=new,
                                finished=o.finished,
                                finish_reason=o.outputs[0].finish_reason,
                                stop_reason=o.outputs[0].stop_reason,
                            ))
                    self.output_sock.send(proto.encode(proto.OUTPUTS,
                                                       wire))
        self.output_sock.close(0)
        self.input_sock.close(0)
        self.ctx.term()


class MockEngineProc:
    """Protocol-faithful fake engine: echoes ``prompt[i] + 1`` tokens,
    one per "step", up to max_tokens. Ref analog: rust vllm-mock-engine
    (io.rs:12-79)."""

    def __init__(self, input_addr: str, output_addr: str) -> None:
        self.ctx = zmq.Context()
        self.input_sock = self.ctx.socket(zmq.PULL)
        self.input_sock.bind(input_addr)
        self.output_sock = self.ctx.socket(zmq.PUSH)
        self.output_sock.bind(output_addr)
        self._running = True
        # request_id -> (emitted, max_tokens, prompt)
        self.active: dict[str, list] = {}

    def run_busy_loop(self) -> None:
        self.output_sock.send(proto.encode(proto.READY, {}))
        while self._running:
            timeout = 0 if self.active else 50
            while self.input_sock.poll(timeout):
                msg_type, body = proto.decode(self.input_sock.recv())
                if msg_type == proto.ADD:
                    req = proto.WireRequest(**body)
                    self.active[req.request_id] = [
                        [], req.sampling.get("max_tokens", 4),
                        req.prompt_token_ids
                    ]
                elif msg_type == proto.ABORT:
                    for rid in body["request_ids"]:
                        self.active.pop(rid, None)
                elif msg_type == proto.SHUTDOWN:
                    self._running = False
                timeout = 0
            if not self._running:
                break
            outs = []
            for rid, (emitted, max_toks, prompt) in list(
                    self.active.items()):
                tok = (prompt[len(emitted) % len(prompt)] + 1) % 32000
                emitted.append(tok)
                finished = len(emitted) >= max_toks
                outs.append(
                    proto.WireOutput(
                        request_id=rid,
                        new_token_ids=list(emitted) if finished else [tok],
                        finished=finished,
                        finish_reason="length" if finished else None,
                    ))
                if finished:
                    del self.active[rid]
            if outs:
                self.output_sock.send(proto.encode(proto.OUTPUTS, outs))
        self.output_sock.close(0)
        self.input_sock.close(0)
        self.ctx.term()


def start_in_thread(proc) -> threading.Thread:
    t = threading.Thread(target=proc.run_busy_loop, daemon=True)
    t.start()
    return t
