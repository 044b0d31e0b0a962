"""Device ops: attention, KV-cache write, normalization, rotary, quant.

Each hot op has two implementations sharing one interface and layout:
- ``*_xla``: pure jax.numpy (runs anywhere, ground truth for tests)
- Pallas TPU kernels (the production path)

Backend selection lives in :mod:`vllm_tpu.ops.dispatch`.
"""
