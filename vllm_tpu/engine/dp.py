"""Engine-level data parallelism: coordinator + load-balancing client.

One EngineCore per DP rank (its own scheduler, KV pool, and model
replica on its own mesh/slice), a coordinator tracking per-rank load
and wave state, and a client that routes requests to the least-loaded
rank. TPU-native translation of the reference's DP control plane
(ref: vllm/v1/engine/coordinator.py DPCoordinator:23,
core_client.py DPAsyncMPClient:1252 / DPLBAsyncMPClient:1434,
config/parallel.py internal/external LB modes).

Wave lockstep: when expert parallelism spans DP ranks, every rank must
execute the same number of forward steps (MoE all-to-alls are
collective over the full EP group). The coordinator numbers "waves" —
contiguous spans where at least one rank has work — and, when lockstep
is enabled, idle ranks run *dummy steps* (forward on an all-padding
batch) until the wave ends (ref analog: wave-synced dummy steps,
coordinator.py + dp_utils.py).

Topology (ZMQ): each rank PUSHes load reports to the coordinator's
PULL socket; the coordinator PUBs wave state; ranks and clients SUB.
Request/output traffic stays on the per-rank engine sockets — the
coordinator is control-plane only, exactly like the reference.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import zmq

from vllm_tpu.engine import protocol as proto
from vllm_tpu.engine.core_client import ZmqSyncClient
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


@dataclass
class RankState:
    num_running: int = 0
    num_waiting: int = 0
    last_report: float = field(default_factory=time.monotonic)

    @property
    def load(self) -> int:
        return self.num_running + self.num_waiting


class DPCoordinator:
    """Control-plane process: aggregates rank load, broadcasts wave
    state. Ref analog: DPCoordinatorProc (coordinator.py:146)."""

    def __init__(self, report_addr: str, publish_addr: str,
                 num_ranks: int) -> None:
        self.ctx = zmq.Context()
        self.report_sock = self.ctx.socket(zmq.PULL)
        self.report_sock.bind(report_addr)
        self.pub_sock = self.ctx.socket(zmq.PUB)
        self.pub_sock.bind(publish_addr)
        self.num_ranks = num_ranks
        self.ranks = [RankState() for _ in range(num_ranks)]
        self.wave = 0
        self.wave_active = False
        self._running = True

    def _publish(self) -> None:
        self.pub_sock.send(
            proto.encode(
                proto.WAVE, {
                    "wave": self.wave,
                    "active": self.wave_active,
                    "loads": [r.load for r in self.ranks],
                }))

    def run(self, poll_ms: int = 20) -> None:
        self._publish()
        while self._running:
            changed = False
            while self.report_sock.poll(poll_ms):
                msg_type, body = proto.decode(self.report_sock.recv())
                if msg_type == proto.SHUTDOWN:
                    self._running = False
                    break
                assert msg_type == proto.REPORT
                r = self.ranks[body["rank"]]
                r.num_running = body["num_running"]
                r.num_waiting = body["num_waiting"]
                r.last_report = time.monotonic()
                changed = True
            any_busy = any(r.load > 0 for r in self.ranks)
            if any_busy and not self.wave_active:
                self.wave += 1  # all-idle -> busy: a new wave starts
                self.wave_active = True
                changed = True
            elif not any_busy and self.wave_active:
                self.wave_active = False
                changed = True
            if changed:
                self._publish()
        self.pub_sock.close(0)
        self.report_sock.close(0)
        self.ctx.term()

    def stop(self) -> None:
        self._running = False


class DPRankReporter:
    """Engine-side hook: pushes load reports to the coordinator and
    tracks the latest wave state (used by the busy loop to decide on
    dummy steps)."""

    def __init__(self, rank: int, report_addr: str,
                 subscribe_addr: str) -> None:
        self.rank = rank
        self.ctx = zmq.Context()
        self.report_sock = self.ctx.socket(zmq.PUSH)
        self.report_sock.connect(report_addr)
        self.sub_sock = self.ctx.socket(zmq.SUB)
        self.sub_sock.connect(subscribe_addr)
        self.sub_sock.setsockopt_string(zmq.SUBSCRIBE, "")
        self.wave = 0
        self.wave_active = False

    def report(self, num_running: int, num_waiting: int) -> None:
        self.report_sock.send(
            proto.encode(
                proto.REPORT, {
                    "rank": self.rank,
                    "num_running": num_running,
                    "num_waiting": num_waiting,
                }))

    def poll_wave(self, timeout_ms: int = 0) -> None:
        while self.sub_sock.poll(timeout_ms):
            msg_type, body = proto.decode(self.sub_sock.recv())
            if msg_type == proto.WAVE:
                self.wave = body["wave"]
                self.wave_active = body["active"]
            timeout_ms = 0

    def close(self) -> None:
        self.report_sock.close(0)
        self.sub_sock.close(0)
        self.ctx.term()


class DPLBClient:
    """Routes requests to the least-loaded DP rank; merges outputs.
    Ref analog: DPLBAsyncMPClient (core_client.py:1434) — load-aware
    routing with local outstanding-count fallback between coordinator
    updates."""

    def __init__(self, engine_addrs: list[tuple[str, str]],
                 publish_addr: Optional[str] = None) -> None:
        self.clients = [
            ZmqSyncClient(in_addr, out_addr)
            for in_addr, out_addr in engine_addrs
        ]
        self.outstanding = [0] * len(self.clients)
        self.req_rank: dict[str, int] = {}
        self._lock = threading.Lock()
        self.sub_sock = None
        self._loads: Optional[list[int]] = None
        if publish_addr is not None:
            self._sub_ctx = zmq.Context()
            self.sub_sock = self._sub_ctx.socket(zmq.SUB)
            self.sub_sock.connect(publish_addr)
            self.sub_sock.setsockopt_string(zmq.SUBSCRIBE, "")

    def _poll_loads(self) -> None:
        if self.sub_sock is None:
            return
        while self.sub_sock.poll(0):
            msg_type, body = proto.decode(self.sub_sock.recv())
            if msg_type == proto.WAVE:
                self._loads = body["loads"]

    def pick_rank(self) -> int:
        self._poll_loads()
        with self._lock:
            # Coordinator loads lag; add local outstanding deltas.
            base = self._loads or [0] * len(self.clients)
            scores = [
                base[i] + self.outstanding[i]
                for i in range(len(self.clients))
            ]
            return scores.index(min(scores))

    def add_request(self, request_id: str, prompt_token_ids: list[int],
                    params: SamplingParams, priority: int = 0) -> int:
        rank = self.pick_rank()
        with self._lock:
            self.outstanding[rank] += 1
            self.req_rank[request_id] = rank
        self.clients[rank].add_request(request_id, prompt_token_ids,
                                       params, priority)
        return rank

    def abort_requests(self, request_ids: list[str]) -> None:
        by_rank: dict[int, list[str]] = {}
        with self._lock:
            for rid in request_ids:
                rank = self.req_rank.pop(rid, None)
                if rank is not None:
                    by_rank.setdefault(rank, []).append(rid)
                    self.outstanding[rank] -= 1
        for rank, rids in by_rank.items():
            self.clients[rank].abort_requests(rids)

    def recv_outputs(self,
                     timeout_ms: int = 100) -> list[proto.WireOutput]:
        outs: list[proto.WireOutput] = []
        per = max(1, timeout_ms // max(1, len(self.clients)))
        for rank, c in enumerate(self.clients):
            for out in c.recv_outputs(timeout_ms=per):
                if out.finished:
                    with self._lock:
                        if self.req_rank.pop(out.request_id,
                                             None) is not None:
                            self.outstanding[rank] -= 1
                outs.append(out)
        return outs

    def shutdown_engines(self) -> None:
        for c in self.clients:
            c.shutdown_engine()

    def close(self) -> None:
        for c in self.clients:
            c.close()
        if self.sub_sock is not None:
            self.sub_sock.close(0)
            self._sub_ctx.term()


class DPEngineCoreProc:
    """EngineCoreProc variant for one DP rank: reports load to the
    coordinator and (when ``lockstep``) runs dummy steps while the
    wave is active but this rank is idle.

    Ref analog: EngineCoreProc DP handshake + wave-synced dummy steps
    (core.py EngineCoreProc, coordinator.py)."""

    def __init__(self, config, rank: int, input_addr: str,
                 output_addr: str, report_addr: str, publish_addr: str,
                 params=None, tokenizer=None, mesh=None,
                 lockstep: bool = False) -> None:
        from vllm_tpu.engine.llm_engine import LLMEngine
        self.engine = LLMEngine(config, params=params, tokenizer=tokenizer,
                                mesh=mesh)
        self.rank = rank
        self.lockstep = lockstep
        self.dummy_steps = 0  # observable for tests
        self.reporter = DPRankReporter(rank, report_addr, publish_addr)
        self.ctx = zmq.Context()
        self.input_sock = self.ctx.socket(zmq.PULL)
        self.input_sock.bind(input_addr)
        self.output_sock = self.ctx.socket(zmq.PUSH)
        self.output_sock.bind(output_addr)
        self._running = True
        self._emitted: dict[str, int] = {}

    def _report(self) -> None:
        s = self.engine.scheduler
        self.reporter.report(len(s.running), len(s.waiting))

    def run_busy_loop(self) -> None:
        self.output_sock.send(proto.encode(proto.READY,
                                           {"rank": self.rank}))
        self._report()
        while self._running:
            busy = self.engine.has_unfinished_requests()
            self.reporter.poll_wave()
            must_step = busy or (self.lockstep
                                 and self.reporter.wave_active)
            timeout = 0 if must_step else 50
            got_input = False
            while self.input_sock.poll(timeout):
                msg_type, body = proto.decode(self.input_sock.recv())
                if msg_type == proto.ADD:
                    req = proto.WireRequest(**body)
                    self.engine.add_request(req.prompt_token_ids,
                                            req.to_sampling_params(),
                                            req.request_id,
                                            priority=req.priority)
                    got_input = True
                elif msg_type == proto.ABORT:
                    self.engine.abort_request(body["request_ids"])
                    for rid in body["request_ids"]:
                        self._emitted.pop(rid, None)
                    got_input = True
                elif msg_type == proto.SHUTDOWN:
                    self._running = False
                timeout = 0
            if not self._running:
                break
            if got_input:
                self._report()
            if self.engine.has_unfinished_requests():
                outs = self.engine.step()
                self._report()
                if outs:
                    self._send_outputs(outs)
            elif self.lockstep and self.reporter.wave_active:
                # Idle rank inside an active wave: participate in the
                # collective program without real tokens.
                self.engine.step_dummy()
                self.dummy_steps += 1

        self.reporter.close()
        self.output_sock.close(0)
        self.input_sock.close(0)
        self.ctx.term()

    def _send_outputs(self, outs) -> None:
        wire = []
        for o in outs:
            toks = list(o.outputs[0].token_ids)
            if o.finished:
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
        self.output_sock.send(proto.encode(proto.OUTPUTS, wire))
