"""Draft-model speculative decoding: an independent (smaller) causal LM
drafts k tokens autoregressively; the target verifies them in one step.

Ref analog: vllm/v1/spec_decode/draft_model.py (DraftModelProposer:19)
+ llm_base_proposer.py. TPU-native formulation mirrors the EAGLE
proposer (spec_decode/eagle.py): the whole proposal — draft "prefill"
over this step's scheduled token stream plus k chained single-token
steps — is ONE jitted program, and the draft keeps its own paged KV
cache indexed by the target's block tables / slot mapping (the
scheduler's lookahead headroom covers the chained writes; entries past
the accepted length are stale-but-harmless, masked by seq_len and
overwritten position-wise as the sequence grows).

Unlike EAGLE there is no hidden-state feedback: the draft consumes
tokens only, through its own embeddings and LM head. Vocabularies must
match (the reference's heterogeneous-vocab VocabMapping is out of
scope; it raises the same way — ref draft_model.py
_raise_if_vocab_size_mismatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.models import llama
from vllm_tpu.ops.metadata import AttentionMetadata


def _propose_impl(
    dcfg: ModelConfig,
    block_size: int,
    k: int,
    q_blk: int,
    draft_params: dict,
    draft_caches: list[jax.Array],
    input_ids: jax.Array,  # [T] this step's scheduled tokens
    positions: jax.Array,  # [T]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,  # [R]
    slot_mapping: jax.Array,  # [T]
    block_tables: jax.Array,  # [R, max_blocks]
    next_tokens: jax.Array,  # [R] the target's freshly emitted token
    last_idx: jax.Array,  # [R] flat index of the last accepted pos
    active: jax.Array,  # [R] bool
):
    """Returns (drafts [R, k] int32, updated draft caches)."""
    R = next_tokens.shape[0]
    # Draft prefill: run the draft model over the same token stream the
    # target consumed this step, filling the draft KV cache.
    meta = AttentionMetadata(slot_mapping=slot_mapping,
                             block_tables=block_tables,
                             query_start_loc=query_start_loc,
                             seq_lens=seq_lens)
    _, draft_caches = llama.forward(draft_params, dcfg, input_ids,
                                    positions, draft_caches, meta, q_blk)

    # k chained decode steps. Step 0 consumes the emitted token at the
    # position just past the last accepted one and predicts the first
    # draft; step i consumes draft i-1.
    cur_tok = next_tokens
    pos = positions[last_idx] + 1
    drafts = []
    for _ in range(k):
        block_idx = pos // block_size
        slots = (jnp.take_along_axis(block_tables, block_idx[:, None],
                                     axis=1)[:, 0] * block_size +
                 pos % block_size)
        step_meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=block_tables,
            query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
            seq_lens=jnp.where(active, pos + 1, 0),
        )
        h, draft_caches = llama.forward(draft_params, dcfg, cur_tok,
                                        pos, draft_caches, step_meta,
                                        q_blk=1)
        logits = llama.compute_logits(draft_params, dcfg, h)
        cur_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        drafts.append(cur_tok)
        pos = pos + 1

    return jnp.stack(drafts, axis=1), draft_caches  # [R, k]


class DraftModelProposer:
    """Runner-facing proposer (EagleProposer.propose signature; the
    target hidden states are ignored — token-only drafting)."""

    def __init__(self, draft_params: dict, dcfg: ModelConfig,
                 target_cfg: ModelConfig, k: int, num_kv_blocks: int,
                 block_size: int, cache_dtype: str = "auto") -> None:
        from vllm_tpu.ops.kv_cache import make_kv_cache
        if dcfg.vocab_size != target_cfg.vocab_size:
            raise ValueError(
                f"draft vocab {dcfg.vocab_size} != target vocab "
                f"{target_cfg.vocab_size}; heterogeneous-vocab drafting "
                f"is not supported (ref: draft_model.py "
                f"verify_equal_vocab_size_if_draft_model)")
        self.k = k
        self.dcfg = dcfg
        self.draft_params = draft_params
        self.draft_caches = [
            make_kv_cache(num_kv_blocks, block_size, dcfg.num_kv_heads,
                          dcfg.head_dim, cache_dtype, dcfg.dtype)
            for _ in range(dcfg.num_layers)
        ]
        self._fn = jax.jit(
            functools.partial(_propose_impl, dcfg, block_size, k),
            static_argnums=(0, ),  # q_blk
            donate_argnums=(2, ),  # draft caches
        )

    def propose(self, target_params: dict, hidden, inputs,
                next_tokens: np.ndarray, last_idx: np.ndarray,
                active: np.ndarray, q_blk: int) -> np.ndarray:
        drafts, self.draft_caches = self._fn(
            q_blk, self.draft_params, self.draft_caches,
            inputs.input_ids, inputs.positions, inputs.query_start_loc,
            inputs.seq_lens, inputs.slot_mapping, inputs.block_tables,
            jnp.asarray(next_tokens), jnp.asarray(last_idx),
            jnp.asarray(active))
        return np.asarray(jax.device_get(drafts))
