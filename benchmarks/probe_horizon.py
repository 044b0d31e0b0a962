"""Time the host phases of multi-step decode horizons on the real
bench engine (8B INT4 + fp8_pth KV, bs32): launch vs finish vs
scheduler, to localize the per-horizon host tail."""
import os
import sys
import time

sys.argv = ["bench"]
os.environ.setdefault("VLLM_TPU_BENCH_HORIZON", "64")

import numpy as np


def main():
    import bench
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.sample.params import SamplingParams
    mc = ModelConfig(vocab_size=32000, hidden_size=4096,
                     intermediate_size=14336, num_layers=32,
                     num_heads=32, num_kv_heads=8,
                     max_model_len=1024, dtype="bfloat16")
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=32, num_gpu_blocks=401,
                          cache_dtype="fp8_pth",
                          enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_batched_tokens=2048,
                                  max_num_seqs=32,
                                  multi_step_decode_horizon=64),
    )
    params = bench._host_quantized_params(mc, "int4")
    eng = LLMEngine(cfg, params=params, tokenizer=None)
    cfg.model.eos_token_ids = []
    rng = np.random.default_rng(0)
    for i in range(32):
        eng.add_request([int(x) for x in rng.integers(100, 31000, 128)],
                        SamplingParams(temperature=0.0, max_tokens=192,
                                       ignore_eos=True),
                        request_id=f"r{i}")
    rows = []
    while eng.has_unfinished_requests():
        t0 = time.perf_counter()
        so = eng.scheduler.schedule()
        t1 = time.perf_counter()
        h = eng.runner.launch_step(so)
        t2 = time.perf_counter()
        ro = eng.runner.finish_step(h)
        t3 = time.perf_counter()
        co = eng.scheduler.update_from_output(so, ro)
        res, ab = eng.output_processor.process_outputs(co)
        t4 = time.perf_counter()
        if so.decode_horizon > 1:
            rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3))
    for i, r in enumerate(rows):
        print(f"h{i}: sched {r[0]*1e3:7.1f}  launch {r[1]*1e3:7.1f}  "
              f"finish {r[2]*1e3:7.1f}  upd+proc {r[3]*1e3:7.1f} ms")
    a = np.array(rows[1:])  # skip compile-affected first
    print(f"median: sched {np.median(a[:,0])*1e3:.1f}  launch "
          f"{np.median(a[:,1])*1e3:.1f}  finish "
          f"{np.median(a[:,2])*1e3:.1f}  upd+proc "
          f"{np.median(a[:,3])*1e3:.1f} ms; device/step should be "
          f"~6.4 ms -> horizon ~410 ms")


main()
