"""Multi-host control plane: 2 processes x 4 virtual CPU devices = one
8-device JAX runtime; node 0 runs the engine, node 1 replays the step
stream (engine/multihost.py).

Ref analog: multi-node executor + DP master handshake
(vllm/v1/executor/ray_executor.py:64, config/parallel.py:141), tested
cluster-free like the reference's multi_process_parallel
(tests/utils.py:1421).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_tp8_engine(tmp_path):
    driver = os.path.join(os.path.dirname(__file__),
                          "multihost_driver.py")
    mport, wport = _free_port(), _free_port()
    outs = [str(tmp_path / f"out{i}.txt") for i in range(2)]
    env = {
        k: v
        for k, v in os.environ.items() if not k.startswith(("JAX_", ))
    }
    env["XLA_FLAGS"] = ""  # driver sets its own device count
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, driver,
             str(rank), "2",
             str(mport), str(wport), outs[rank]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        ) for rank in range(2)
    ]
    logs = [p.communicate(timeout=560)[0].decode() for p in procs]
    for rank, p in enumerate(procs):
        assert p.returncode == 0, (
            f"node {rank} failed:\n{logs[rank][-4000:]}")
    head = eval(open(outs[0]).read())  # list of token lists
    assert len(head) == 3 and all(len(t) == 8 for t in head)
    worker = open(outs[1]).read()
    assert worker.startswith("worker_steps=")
    assert int(worker.split("=")[1]) > 0

    # Greedy parity vs a single-process 8-device tp=8 engine: the
    # cross-host program must compute the same tokens.
    parity = str(tmp_path / "single.txt")
    env2 = dict(env)
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    body = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';\n"
        "import numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_default_matmul_precision','highest')\n"
        "from vllm_tpu.config import *\n"
        "from vllm_tpu.engine.llm_engine import LLMEngine\n"
        "from vllm_tpu.models import llama\n"
        "from vllm_tpu.parallel.mesh import make_mesh\n"
        "from vllm_tpu.sample.params import SamplingParams\n"
        "mc = ModelConfig(vocab_size=256, hidden_size=128,"
        " intermediate_size=256, num_layers=2, num_heads=8,"
        " num_kv_heads=8, max_model_len=128, dtype='float32')\n"
        "cfg = EngineConfig(model=mc,"
        " cache=CacheConfig(block_size=16, num_gpu_blocks=65),"
        " scheduler=SchedulerConfig(max_num_batched_tokens=128,"
        " max_num_seqs=4, multi_step_decode_horizon=1),"
        " parallel=ParallelConfig(tensor_parallel_size=8))\n"
        "params = jax.tree.map(np.asarray, llama.random_params(mc, seed=3))\n"
        "eng = LLMEngine(cfg, params=params, tokenizer=None,"
        " mesh=make_mesh(cfg.parallel))\n"
        "prompts = [[1, 9, 17, 33], [7, 7, 7], [100, 101, 102]]\n"
        "ids = [eng.add_request(p, SamplingParams(temperature=0.0,"
        " max_tokens=8, ignore_eos=True)) for p in prompts]\n"
        "done = {}\n"
        "while eng.has_unfinished_requests():\n"
        "    for o in eng.step():\n"
        "        if o.outputs: done[o.request_id] = list(o.outputs[0].token_ids)\n"
        f"open({parity!r}, 'w').write(repr([done[i] for i in ids]))\n")
    env2["PYTHONPATH"] = env["PYTHONPATH"]
    r = subprocess.run([sys.executable, "-c", body], env=env2,
                       capture_output=True, timeout=560,
                       cwd=os.path.join(os.path.dirname(__file__), "..",
                                        ".."))
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    single = eval(open(parity).read())
    assert head == single
