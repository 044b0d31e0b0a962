"""Benchmark: decode throughput of the full engine on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: TinyLlama-1.1B-shaped model (random bf16 weights), 32 concurrent
requests, 128-token prompts, 64 decode tokens each — measures steady-
state continuous-batching decode tokens/s through the real runner
(jitted forward + KV write + sample). The reference publishes no
absolute numbers (BASELINE.md), so vs_baseline is 1.0 until we pin our
own round-over-round baseline.
"""

import json
import sys
import time


def main() -> None:
    import jax

    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    from vllm_tpu.sample.params import SamplingParams

    num_reqs = 32
    prompt_len = 128
    decode_len = 64

    cfg = EngineConfig(
        model=ModelConfig(
            vocab_size=32000,
            hidden_size=2048,
            intermediate_size=5632,
            num_layers=22,
            num_heads=32,
            num_kv_heads=4,
            max_model_len=1024,
            dtype="bfloat16",
        ),
        cache=CacheConfig(block_size=32, num_gpu_blocks=1025,
                          enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_batched_tokens=2048,
                                  max_num_seqs=num_reqs),
    )
    print(f"devices: {jax.devices()}", file=sys.stderr)
    params = llama.random_params(cfg.model, seed=0)
    quant = __import__("os").environ.get("VLLM_TPU_BENCH_QUANT")
    if quant:  # e.g. int4 / int8 / w8a8_int8 / fp8
        from vllm_tpu.quant.online import quantize_params_online
        params = quantize_params_online(params, quant)
    engine = LLMEngine(cfg, params=params, tokenizer=None)
    cfg.model.eos_token_ids = []  # type: ignore[attr-defined]

    rng = __import__("random").Random(0)

    def add_all(tag: str):
        for i in range(num_reqs):
            prompt = [rng.randrange(100, 31000) for _ in range(prompt_len)]
            engine.add_request(prompt,
                               SamplingParams(temperature=0.0,
                                              max_tokens=decode_len,
                                              ignore_eos=True),
                               request_id=f"{tag}-{i}")

    # Warmup round: compiles every (prefill, decode) bucket.
    t0 = time.perf_counter()
    add_all("warm")
    while engine.has_unfinished_requests():
        engine.step()
    print(f"warmup (incl compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # Timed round: prefill then steady decode. Decode-only rate is
    # measured from the first step in which every request has emitted
    # at least one token (prefill done) to completion, via the engine's
    # generation-token counter (multi-step steps emit >1 per request).
    add_all("bench")
    m = engine.metrics
    t_start = time.perf_counter()
    g_start = m.generation_tokens_total
    decode_t0 = None
    decode_g0 = 0
    emitted: set[str] = set()
    while engine.has_unfinished_requests():
        outs = engine.step()
        for o in outs:
            emitted.add(o.request_id)
        if decode_t0 is None and len(emitted) >= num_reqs:
            decode_t0 = time.perf_counter()
            decode_g0 = m.generation_tokens_total
    t_end = time.perf_counter()
    total_time = t_end - t_start
    decode_tokens = m.generation_tokens_total - decode_g0
    decode_time = (t_end - decode_t0) if decode_t0 else 0.0
    tput = decode_tokens / decode_time if decode_time > 0 else 0.0
    total_out = m.generation_tokens_total - g_start

    print(
        f"total: {total_out} tokens in {total_time:.2f}s "
        f"({total_out/total_time:.1f} tok/s e2e); "
        f"decode-only: {decode_tokens} tokens in {decode_time:.2f}s",
        file=sys.stderr)
    print(
        json.dumps({
            "metric": "decode_tokens_per_sec_1.1B_bs32" + ("_" + quant if quant else "_bf16"),
            "value": round(tput, 1),
            "unit": "tok/s",
            "vs_baseline": 1.0,
        }))


if __name__ == "__main__":
    main()
