"""Multi-host control plane: one engine process per host, a global
device mesh spanning hosts, and a ZMQ broadcast of SchedulerOutput so
every process executes the same SPMD step.

Ref analog: the reference's executor boundary — MultiprocExecutor
broadcasting SchedulerOutput to WorkerProcs over a shared-memory ring
(vllm/v1/executor/multiproc_executor.py:108, shm_broadcast.py:465) and
the Ray multi-node executor (vllm/v1/executor/ray_executor.py:64) with
DP master handshake (vllm/config/parallel.py:141
data_parallel_master_ip). TPU-native translation:

- `jax.distributed.initialize` makes all hosts' chips one device set;
  TP/EP/PP/DP mesh axes may span hosts (XLA routes collectives over
  ICI within a slice and DCN across — no hand-written rings).
- Multi-controller SPMD: every process must run the SAME jitted
  program each step, so the head (node 0) serializes each
  SchedulerOutput and PUSHes it to every worker's PULL socket; workers
  replay `runner.execute_model(out)` on their local runner. Given the
  identical output stream, each runner's persistent batch and sampled
  tokens evolve bit-identically (seeded, counter-based sampling) — the
  workers never send anything back on the hot path (the reference's
  shm ring is one-directional for broadcast the same way).
- The scheduler, KV bookkeeping, detokenization, and client API live
  only on the head; workers are execution bodies (the reference's
  WorkerProc busy loop, multiproc_executor.py:542).

Host inputs built from the broadcast (input_ids, positions, ...) are
identical numpy arrays on every process, which JAX treats as fully
replicated over the global mesh inside jit.
"""

from __future__ import annotations

import pickle
from typing import Optional

import zmq

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

# Wire op-codes (pickled tuples (op, payload) — this link is an
# intra-cluster trusted transport, like the reference's shm ring).
STEP = "step"
DUMMY = "dummy"
STOP = "stop"
PING = "ping"


def init_multihost(node_rank: int, num_nodes: int, master_addr: str,
                   local_device_count: Optional[int] = None) -> None:
    """Join the cross-host JAX runtime (ref analog:
    init_distributed_environment, parallel_state.py:1584). After this,
    jax.devices() is global and meshes may span hosts.

    ``local_device_count`` forces a virtual CPU device count per
    process (tests: 2 processes x 4 CPU devices = one 8-device mesh).
    """
    import jax
    if local_device_count is not None:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
    jax.distributed.initialize(coordinator_address=master_addr,
                               num_processes=num_nodes,
                               process_id=node_rank)
    logger.info("multihost: node %d/%d joined %s (%d global devices)",
                node_rank, num_nodes, master_addr,
                len(jax.devices()))


class _BroadcastRunner:
    """Head-side runner proxy: every device-touching call is serialized
    to the workers BEFORE running locally, so all processes enter the
    same jitted program in the same order."""

    def __init__(self, runner, socks) -> None:
        self._runner = runner
        self._socks = socks

    def __getattr__(self, name):
        return getattr(self._runner, name)

    # Attribute writes the engine performs must reach the real runner.
    def __setattr__(self, name, value):
        if name in ("_runner", "_socks"):
            object.__setattr__(self, name, value)
        else:
            setattr(self._runner, name, value)

    def _send(self, op, payload=None) -> None:
        frame = pickle.dumps((op, payload),
                             protocol=pickle.HIGHEST_PROTOCOL)
        for s in self._socks:
            s.send(frame)

    def launch_step(self, out):
        self._send(STEP, out)
        return self._runner.launch_step(out)

    def execute_model(self, out):
        return self.finish_step(self.launch_step(out))

    def execute_dummy(self):
        self._send(DUMMY)
        return self._runner.execute_dummy()

    def stop_workers(self) -> None:
        self._send(STOP)


class MultiHostEngine:
    """Node-0 engine wrapper: a normal LLMEngine whose runner
    broadcasts each step to the worker processes first."""

    def __init__(self, config, params=None, tokenizer=None, mesh=None,
                 worker_addrs: Optional[list[str]] = None) -> None:
        from vllm_tpu.engine.llm_engine import LLMEngine
        self.ctx = zmq.Context()
        self.socks = []
        for addr in worker_addrs or []:
            s = self.ctx.socket(zmq.PUSH)
            s.connect(addr)
            self.socks.append(s)
        self.engine = LLMEngine(config, params=params,
                                tokenizer=tokenizer, mesh=mesh)
        self.engine.runner = _BroadcastRunner(self.engine.runner,
                                              self.socks)

    def __getattr__(self, name):
        return getattr(self.engine, name)

    def shutdown(self) -> None:
        self.engine.runner.stop_workers()
        for s in self.socks:
            s.close(0)
        self.ctx.term()


def run_worker(config, params, num_blocks, mesh, bind_addr: str,
               ready_addr: Optional[str] = None) -> int:
    """Worker busy loop (ref analog: WorkerProc.worker_busy_loop,
    multiproc_executor.py:542): replay the head's step stream on the
    local runner. Returns the number of steps executed."""
    from vllm_tpu.worker.runner import TPUModelRunner
    if params is None:
        # CLI worker: load the same checkpoint the head loads (every
        # process needs identical replicated host inputs).
        from vllm_tpu.loader.safetensors_loader import load_llama_params
        mc, qc = config.model, config.quant
        if qc.enabled and qc.method in ("int4", "int8", "w8a8_int8",
                                        "fp8", "mxfp4", "mxfp8"):
            from vllm_tpu.quant.online import quantize_params_online
            params = quantize_params_online(
                load_llama_params(mc.model, mc, None), qc.method)
        else:
            params = load_llama_params(mc.model, mc,
                                       qc if qc.enabled else None)
    if num_blocks is None:
        raise ValueError(
            "multi-host workers need an explicit --num-kv-blocks "
            "(the head's memory probe is not broadcast)")
    runner = TPUModelRunner(config, params, num_blocks, mesh=mesh)
    ctx = zmq.Context()
    sock = ctx.socket(zmq.PULL)
    sock.bind(bind_addr)
    if ready_addr is not None:
        r = ctx.socket(zmq.PUSH)
        r.connect(ready_addr)
        r.send(b"ready")
        r.close(0)
    steps = 0
    while True:
        op, payload = pickle.loads(sock.recv())
        if op == STOP:
            break
        if op == STEP:
            runner.execute_model(payload)
            steps += 1
        elif op == DUMMY:
            runner.execute_dummy()
            steps += 1
    sock.close(0)
    ctx.term()
    return steps
