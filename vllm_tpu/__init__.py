"""vllm_tpu — a TPU-native LLM inference engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference vLLM fork (see SURVEY.md), designed TPU-first:

- continuous batching over fixed-shape persistent batches (no dynamic
  shapes under jit; padding ladders instead of CUDA graphs)
- paged, quantized KV-cache managed by a pure-Python block pool with
  prefix caching (behavioral parity with the reference's
  vllm/v1/core/{block_pool,kv_cache_manager}.py)
- Pallas kernels for ragged paged attention (in-kernel KV dequant) and
  fused group-quant dequant-GEMM (INT4/INT8 weight-only, W8A8)
- pjit/shard_map meshes with named axes (tp/dp/ep) for scale-out
"""

__version__ = "0.1.0"

__all__ = ["LLM", "SamplingParams", "PoolingParams", "AsyncLLM",
           "EngineConfig", "__version__"]


def __getattr__(name):
    # Lazy exports: importing vllm_tpu.core must not pull in JAX.
    if name == "SamplingParams":
        from vllm_tpu.sample.params import SamplingParams
        return SamplingParams
    if name == "PoolingParams":
        from vllm_tpu.sample.params import PoolingParams
        return PoolingParams
    if name == "LLM":
        from vllm_tpu.engine.llm import LLM
        return LLM
    if name == "AsyncLLM":
        from vllm_tpu.engine.async_llm import AsyncLLM
        return AsyncLLM
    if name == "EngineConfig":
        from vllm_tpu.config import EngineConfig
        return EngineConfig
    raise AttributeError(name)
