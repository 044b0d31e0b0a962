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
from vllm_tpu.parallel.mesh import AXIS_EP, AXIS_TP

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

    # MoE stacked-expert leaves: expert axis 0 over ``ep`` (expert
    # parallelism — ops/moe._ep_moe consumes these via shard_map),
    # Megatron TP within each expert on the inner dims.
    ep = mesh.shape[AXIS_EP]
    e_ax = AXIS_EP if ep > 1 else None
    if ep > 1 and cfg.num_experts:
        # Validate against the actual *stack* size, not
        # cfg.num_experts: under EPLB the stacks are already physical
        # (num_experts + redundant replicas, runner._init_eplb runs
        # before sharding) and only e_phys must divide ep.
        e_stack = cfg.num_experts
        for layer in params.get("layers", []):
            leaf = layer.get("w_gate_up")
            if leaf is not None:
                arr = (next(iter(leaf.values()))
                       if isinstance(leaf, dict) else leaf)
                e_stack = arr.shape[0]
                break
        if e_stack % ep != 0:
            raise ValueError(
                f"expert_parallel_size={ep} must divide the expert "
                f"stack size {e_stack} (num_experts + redundant "
                f"replicas)")
    moe_col = NamedSharding(mesh, P(e_ax, None, AXIS_TP))
    moe_row = NamedSharding(mesh, P(e_ax, AXIS_TP, None))

    # Tile-major prepacked W4A16 qweight [n_n, G, BROWS, bn]
    # (quant/pallas_w4a16.prepack_tiled): the output dim is axis 0,
    # the input dim axis 1.
    col4 = NamedSharding(mesh, P(AXIS_TP, None, None, None))
    row4 = NamedSharding(mesh, P(None, AXIS_TP, None, None))

    def linear_spec(leaf: dict, key: str, col_parallel: bool):
        v = leaf[key]
        if key == "bias":
            return col_bias if col_parallel else rep
        if key == "qweight" and getattr(v, "ndim", 0) == 4:
            return col4 if col_parallel else row4
        return col if col_parallel else row

    def shard_layer(layer: dict) -> dict:
        out = {}
        for name, leaf in layer.items():
            if name in _COL_LINEARS:
                out[name] = {k: linear_spec(leaf, k, True) for k in leaf}
            elif name in _ROW_LINEARS:
                out[name] = {k: linear_spec(leaf, k, False) for k in leaf}
            elif name in ("w_gate_up", "w_down"):
                # MoE experts: Megatron TP *within* each expert (expert
                # parallelism over the ep axis comes with multi-host).
                colp = name == "w_gate_up"
                if isinstance(leaf, dict):  # WNA16 stacked-expert leaf
                    q5_col = NamedSharding(
                        mesh, P(e_ax, AXIS_TP, None, None, None))
                    q5_row = NamedSharding(
                        mesh, P(e_ax, None, AXIS_TP, None, None))
                    out[name] = {
                        k: ((q5_col if colp else q5_row)
                            if k == "qweight"
                            and getattr(leaf[k], "ndim", 0) == 5 else
                            (moe_col if colp else moe_row))
                        for k in leaf
                    }
                else:
                    out[name] = moe_col if colp else moe_row
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


def kv_cache_sharding(cfg: ModelConfig, mesh: Mesh):
    """(data, scales) shardings. data [num_blocks, 2*KH, block_size,
    Dp]: shard the head axis (axis 1) over tp; the block axis
    (axis 0) shards over cp (context parallelism — block placement is
    enforced by the partitioned allocator, parallel/context.py).
    scales [num_blocks, SUBLANE, KH*bs] shard the *lane* axis over tp:
    the head-major lane order makes each rank's head range a
    contiguous lane slice.

    Note: with the split-plane order an even plane split can assign a
    rank K-planes of some heads and V-planes of others, relative to
    the column-parallel QKV head ownership; GSPMD inserts the
    resulting (head-local) resharding on the write path —
    numerically transparent."""
    tp = mesh.shape[AXIS_TP]
    from vllm_tpu.parallel.mesh import AXIS_CP
    if (2 * cfg.num_kv_heads) % tp == 0 and tp <= 2 * cfg.num_kv_heads:
        data = NamedSharding(mesh, P(AXIS_CP, AXIS_TP, None, None))
        scales = NamedSharding(mesh, P(AXIS_CP, None, AXIS_TP))
        return (data, scales)
    return (NamedSharding(mesh, P(AXIS_CP, None, None, None)),
            NamedSharding(mesh, P(AXIS_CP, None, None)))


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """device_put the whole pytree under its sharding annotations."""
    shardings = full_param_shardings(cfg, params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
