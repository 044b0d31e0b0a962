"""Per-step attention metadata — the device-side view of a scheduled
batch.

All arrays are padded to static bucket sizes by the runner; this tuple
is a jit argument (NamedTuple of arrays == pytree). Ref analog:
CommonAttentionMetadata (vllm/v1/attention/backend.py) built by the
model runner's ``_build_attention_metadata`` (gpu_model_runner.py:2325).
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class AttentionMetadata(NamedTuple):
    # [T] flat destination slot (block_id * block_size + offset) for
    # each scheduled token's KV write; padding tokens target block 0.
    slot_mapping: jax.Array
    # [R, max_blocks_per_req] physical block ids per request row.
    block_tables: jax.Array
    # [R+1] cumulative query lengths (ragged row boundaries).
    query_start_loc: jax.Array
    # [R] total KV length per row after this step's tokens.
    seq_lens: jax.Array
