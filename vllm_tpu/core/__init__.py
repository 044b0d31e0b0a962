"""Engine-core data structures: requests, paged-KV bookkeeping, scheduler.

Pure Python, zero device/JAX dependencies — the scheduler never touches
tensors (same boundary as the reference engine core, ref:
vllm/v1/engine/core.py EngineCore owns Scheduler + KV bookkeeping only).
"""
