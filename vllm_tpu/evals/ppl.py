"""Perplexity evaluation — the accuracy gate for quantization.

Ref analog: the lm-eval-harness accuracy pins
(.buildkite/lm-eval-harness/, SURVEY.md §6) — the reference gates each
(model, quant) pair on GSM8K exact-match; BASELINE.md's in-repo gate is
**ppl delta vs FP16 ≤ 0.5 at INT4-g128**. This module computes
teacher-forced perplexity through the real serving stack (paged cache,
quantized kernels — not a separate eval path), so the number certifies
the deployed compute path.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

import numpy as np

from vllm_tpu.utils import cdiv, init_logger

logger = init_logger(__name__)


def compute_ppl_from_params(
    params: dict,
    cfg,
    token_ids: list[int],
    *,
    block_size: int = 16,
    chunk: int = 1024,
) -> float:
    """Teacher-forced ppl over one token sequence via the paged path.

    Runs the sequence as chunked prefill through the real attention/KV
    machinery; position i's logits score token i+1.
    """
    import jax
    import jax.numpy as jnp

    from vllm_tpu.models.registry import get_model
    from vllm_tpu.ops.kv_cache import kv_cache_jnp_dtype, kv_cache_shape
    from vllm_tpu.ops.metadata import AttentionMetadata

    model = get_model(cfg.architecture)
    L = len(token_ids)
    assert L >= 2, "need at least 2 tokens"
    num_blocks = cdiv(L, block_size) + 1
    shape = kv_cache_shape(num_blocks, block_size, cfg.num_kv_heads,
                           cfg.head_dim)
    dtype = kv_cache_jnp_dtype("auto", cfg.dtype)
    caches = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
    bt = np.zeros((1, num_blocks), np.int32)
    bt[0, :] = np.arange(num_blocks)
    bt[0, :] = np.roll(bt[0, :], -1)  # use blocks 1.. (0 = null)
    bt_j = jnp.asarray(bt)

    total_nll = 0.0
    total_cnt = 0
    pos = 0
    while pos < L - 1:
        n = min(chunk, L - pos)
        toks = token_ids[pos:pos + n]
        slots = [
            bt[0, (pos + i) // block_size] * block_size +
            (pos + i) % block_size for i in range(n)
        ]
        meta = AttentionMetadata(
            slot_mapping=jnp.asarray(slots, jnp.int32),
            block_tables=bt_j,
            query_start_loc=jnp.asarray([0, n], jnp.int32),
            seq_lens=jnp.asarray([pos + n], jnp.int32),
        )
        hidden, caches = model.forward(params, cfg,
                                       jnp.asarray(toks, jnp.int32),
                                       jnp.arange(pos, pos + n,
                                                  dtype=jnp.int32),
                                       caches, meta)
        logits = model.compute_logits(params, cfg, hidden)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # targets: token at absolute position pos+i+1
        hi = min(n, L - pos - 1)
        targets = jnp.asarray(token_ids[pos + 1:pos + 1 + hi], jnp.int32)
        nll = -jnp.take_along_axis(logp[:hi], targets[:, None],
                                   axis=-1)[:, 0]
        total_nll += float(jnp.sum(nll))
        total_cnt += hi
        pos += n
    return math.exp(total_nll / total_cnt)


def compute_ppl(llm, text_or_tokens, **kw) -> float:
    """Convenience over an LLM instance (uses its tokenizer/config)."""
    engine = llm.engine
    if isinstance(text_or_tokens, str):
        assert engine.tokenizer is not None
        token_ids = engine.tokenizer.encode(text_or_tokens)
    else:
        token_ids = list(text_or_tokens)
    return compute_ppl_from_params(engine.runner.params,
                                   engine.config.model, token_ids,
                                   block_size=engine.config.cache.block_size,
                                   **kw)
