"""Sharding rules: param pytree + KV caches -> NamedSharding pytree.

Megatron-style tensor parallelism expressed as GSPMD annotations (the
scaling-book recipe: annotate, let XLA insert collectives):

- qkv/gate_up (column-parallel, ref ColumnParallelLinear linear.py:419):
  shard the output dim over ``tp``
- o/down (row-parallel, ref RowParallelLinear linear.py:1613): shard the
  input dim over ``tp`` — XLA inserts the all-reduce where the partial
  sums meet the residual stream
- embedding/lm_head sharded over vocab (ref VocabParallelEmbedding:198);
  norms replicated
- KV cache: shard the head axis over ``tp`` when divisible, else
  replicate (GQA head replication under TP, same policy as the ref)

Note on fused projections: the fused qkv/gate_up output axis is a
concatenation; shard-correctness is guaranteed by GSPMD regardless of
part boundaries (the compiler re-shards around the split op). Perf
co-design (interleaving parts so the split is shard-local) comes with
the Pallas matmul integration.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vllm_tpu.config import ModelConfig
from vllm_tpu.parallel.mesh import AXIS_TP

_COL_LINEARS = ("qkv_proj", "gate_up_proj")
_ROW_LINEARS = ("o_proj", "down_proj")


def full_param_shardings(cfg: ModelConfig, params: dict,
                         mesh: Mesh) -> dict:
    tp = mesh.shape[AXIS_TP]
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, AXIS_TP))
    row = NamedSharding(mesh, P(AXIS_TP, None))
    col_bias = NamedSharding(mesh, P(AXIS_TP))
    vocab_ok = cfg.vocab_size % tp == 0

    moe_col = NamedSharding(mesh, P(None, None, AXIS_TP))
    moe_row = NamedSharding(mesh, P(None, AXIS_TP, None))

    def shard_layer(layer: dict) -> dict:
        out = {}
        for name, leaf in layer.items():
            if name in _COL_LINEARS:
                out[name] = {k: (col_bias if k == "bias" else col)
                             for k in leaf}
            elif name in _ROW_LINEARS:
                out[name] = {k: (rep if k == "bias" else row) for k in leaf}
            elif name == "w_gate_up":
                # MoE experts: Megatron TP *within* each expert (expert
                # parallelism over the ep axis comes with multi-host).
                out[name] = moe_col
            elif name == "w_down":
                out[name] = moe_row
            else:  # norms, router, anything scalar-ish: replicate
                out[name] = jax.tree.map(lambda _: rep, leaf)
        return out

    shardings: dict = {
        "embed_tokens": {
            "weight":
            NamedSharding(mesh, P(AXIS_TP, None)) if vocab_ok else rep
        },
        "norm": rep,
        "layers": [shard_layer(l) for l in params["layers"]],
    }
    if "lm_head" in params:
        shardings["lm_head"] = {
            k: (col if vocab_ok else rep)
            for k in params["lm_head"]
        }
    return shardings


def kv_cache_sharding(cfg: ModelConfig, mesh: Mesh) -> NamedSharding:
    """[num_blocks, 2*KH, block_size, Dp]: shard the head axis (axis 1)
    over tp, matching the head-sharded k/v from column-parallel QKV."""
    tp = mesh.shape[AXIS_TP]
    if (2 * cfg.num_kv_heads) % tp == 0 and tp <= 2 * cfg.num_kv_heads:
        return NamedSharding(mesh, P(None, AXIS_TP, None, None))
    return NamedSharding(mesh, P())


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """device_put the whole pytree under its sharding annotations."""
    shardings = full_param_shardings(cfg, params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
