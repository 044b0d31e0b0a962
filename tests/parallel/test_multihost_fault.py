"""Multi-host failure detection (VERDICT r4 weak #6 / ref analog:
v1/fault_tolerance/engine_core_sentinel.py:35,139 + worker sentinel):

- head side: kill a worker process mid-stream -> the WorkerSentinel
  declares it dead within the timeout, the next step raises
  WorkerLostError, and every in-flight request is aborted cleanly;
- worker side: a head that goes silent releases the worker loop via
  the recv timeout instead of blocking forever.
"""

import os
import signal
import socket
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.multihost import MultiHostEngine, WorkerLostError
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams

pytest.importorskip("zmq")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


MOCK_WORKER = textwrap.dedent("""
    import pickle, sys, threading, time, zmq
    bind_addr, hb_addr, rank = sys.argv[1], sys.argv[2], int(sys.argv[3])
    ctx = zmq.Context()
    sock = ctx.socket(zmq.PULL); sock.bind(bind_addr)
    hs = ctx.socket(zmq.PUSH); hs.connect(hb_addr)
    def hb():
        while True:
            hs.send(pickle.dumps(("ping", rank)))
            time.sleep(0.2)
    threading.Thread(target=hb, daemon=True).start()
    print("mock worker up", flush=True)
    while True:
        op, payload = pickle.loads(sock.recv())
        if op == "stop":
            break
""")


def test_head_detects_worker_death_and_aborts():
    wport, hbport = _free_port(), _free_port()
    worker_addr = f"tcp://127.0.0.1:{wport}"
    hb_bind = f"tcp://127.0.0.1:{hbport}"
    proc = subprocess.Popen(
        [sys.executable, "-c", MOCK_WORKER, worker_addr,
         f"tcp://127.0.0.1:{hbport}", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        assert b"up" in proc.stdout.readline()
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=256, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=256, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=65),
            scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                      max_num_seqs=2),
        )
        params = llama.random_params(cfg.model, seed=0)
        eng = MultiHostEngine(cfg, params=params, tokenizer=None,
                              worker_addrs=[worker_addr],
                              hb_bind=hb_bind, worker_timeout_s=1.5)
        cfg.model.eos_token_ids = []
        rng = np.random.default_rng(0)
        eng.add_request([int(x) for x in rng.integers(10, 250, 16)],
                        SamplingParams(temperature=0.0, max_tokens=200,
                                       ignore_eos=True),
                        request_id="victim")
        # healthy steps first
        for _ in range(3):
            eng.step()
        assert eng.sentinel.dead_workers == set()

        proc.kill()  # SIGKILL mid-stream: no goodbye, no heartbeat
        proc.wait()
        t_kill = time.monotonic()
        detected = None
        while time.monotonic() - t_kill < 6.0:
            try:
                eng.step()
            except WorkerLostError:
                detected = time.monotonic() - t_kill
                break
            time.sleep(0.05)
        assert detected is not None, "worker death never detected"
        assert detected < 4.0  # timeout 1.5s + polling slack
        # clean abort: nothing left scheduled, no hang
        assert not eng.engine.has_unfinished_requests()
        assert eng.sentinel.dead_workers == {0}
        # subsequent steps keep failing fast (no broadcast attempts)
        with pytest.raises(WorkerLostError):
            eng.engine.runner.launch_step(eng.engine.scheduler.schedule())
        eng.sentinel.close()
        eng.shutdown()
    finally:
        if proc.poll() is None:
            proc.kill()


def test_worker_releases_on_dead_head(tmp_path):
    """run_worker with a silent head exits via the recv timeout."""
    wport, hbport = _free_port(), _free_port()
    body = textwrap.dedent(f"""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from vllm_tpu.config import (CacheConfig, EngineConfig,
                                     ModelConfig, SchedulerConfig)
        from vllm_tpu.engine.multihost import run_worker
        from vllm_tpu.models import llama
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=256, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=65),
            scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                      max_num_seqs=2),
        )
        params = llama.random_params(cfg.model, seed=0)
        steps = run_worker(cfg, params, 65, None,
                           "tcp://127.0.0.1:{wport}",
                           hb_addr="tcp://127.0.0.1:{hbport}",
                           rank=0, head_timeout_s=1.0)
        print("worker exited, steps=", steps, flush=True)
    """)
    env = dict(os.environ)
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.monotonic()
    out = subprocess.run([sys.executable, "-c", body], env=env,
                         capture_output=True, timeout=120)
    assert b"worker exited, steps= 0" in out.stdout, out.stdout[-2000:]
    assert time.monotonic() - t0 < 120
