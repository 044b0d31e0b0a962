"""Subprocess body for the multi-host control-plane test.

Spawned (not imported) by test_multihost.py: one process per "host",
each owning 4 virtual CPU devices, joined into one 8-device JAX runtime
via jax.distributed — the same topology trick the reference uses for
cluster-free multi-node tests (tests/utils.py multi_process_parallel).

argv: node_rank num_nodes master_port worker_port out_path
      [local_devices=4]

One tp=(num_nodes*local_devices) engine spans all processes.
"""

import os
import sys


def main() -> None:
    node_rank = int(sys.argv[1])
    num_nodes = int(sys.argv[2])
    master_port = sys.argv[3]
    worker_port = sys.argv[4]
    out_path = sys.argv[5]
    local_devices = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        f" --xla_force_host_platform_device_count={local_devices}").strip()

    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; only the
    # config knob sticks (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from vllm_tpu.engine.multihost import (MultiHostEngine, init_multihost,
                                           run_worker)
    init_multihost(node_rank, num_nodes, f"localhost:{master_port}")

    import numpy as np

    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 ParallelConfig, SchedulerConfig)
    from vllm_tpu.models import llama
    from vllm_tpu.parallel.mesh import make_mesh
    from vllm_tpu.sample.params import SamplingParams

    jax.config.update("jax_default_matmul_precision", "highest")
    n_dev = num_nodes * local_devices
    assert len(jax.devices()) == n_dev, jax.devices()
    mc = ModelConfig(vocab_size=256, hidden_size=128,
                     intermediate_size=256, num_layers=2, num_heads=8,
                     num_kv_heads=8, max_model_len=128, dtype="float32")
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4,
                                  multi_step_decode_horizon=1),
        parallel=ParallelConfig(tensor_parallel_size=n_dev),
    )
    mesh = make_mesh(cfg.parallel)
    # Identical host-side weights on every process (replicated inputs
    # to the global mesh must match bit-for-bit).
    params = jax.tree.map(np.asarray, llama.random_params(mc, seed=3))

    worker_addr = f"tcp://127.0.0.1:{worker_port}"
    if node_rank == 0:
        eng = MultiHostEngine(cfg, params=params, tokenizer=None,
                              mesh=mesh, worker_addrs=[worker_addr])
        prompts = [[1, 9, 17, 33], [7, 7, 7], [100, 101, 102]]
        ids = [
            eng.add_request(
                p,
                SamplingParams(temperature=0.0, max_tokens=8,
                               ignore_eos=True)) for p in prompts
        ]
        done = {}
        steps = 0
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.outputs:
                    done[o.request_id] = list(o.outputs[0].token_ids)
            steps += 1
            assert steps < 200
        eng.shutdown()
        with open(out_path, "w") as f:
            f.write(repr([done[i] for i in ids]))
    else:
        steps = run_worker(cfg, params, 65, mesh, worker_addr)
        with open(out_path, "w") as f:
            f.write(f"worker_steps={steps}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
