"""Device mesh with named axes — the TPU-native GroupCoordinator.

The reference builds one NCCL process group per parallel strategy
(ref: vllm/distributed/parallel_state.py initialize_model_parallel():
1742, _TP/_PP/_DP/_EP/_DCP/_PCP). On TPU all of that collapses into
named axes of a single ``jax.sharding.Mesh``; XLA emits the ICI/DCN
collectives from sharding annotations (SURVEY.md §2.6 TPU-native
equivalent).

Axis order is (dp, ep, pp, cp, tp): tp innermost so tensor-parallel
collectives ride the fastest ICI links; cp (decode/prefill context
parallelism — the reference's _DCP/_PCP groups) sits next to tp since
its per-step collective is one small (out, lse) all-gather.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from vllm_tpu.config import ParallelConfig

AXIS_DP = "dp"
AXIS_EP = "ep"
AXIS_PP = "pp"
AXIS_CP = "cp"
AXIS_TP = "tp"
AXES = (AXIS_DP, AXIS_EP, AXIS_PP, AXIS_CP, AXIS_TP)


def make_mesh(parallel: ParallelConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dp, ep, pp, cp, tp = (parallel.data_parallel_size,
                          parallel.expert_parallel_size,
                          parallel.pipeline_parallel_size,
                          parallel.context_parallel_size,
                          parallel.tensor_parallel_size)
    want = dp * ep * pp * cp * tp
    if want > len(devices):
        raise ValueError(
            f"mesh {dp}x{ep}x{pp}x{cp}x{tp} needs {want} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:want]).reshape(dp, ep, pp, cp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1, 1), AXES)


# -- ambient mesh -----------------------------------------------------
# The runner installs its mesh here so deep compute functions (e.g. the
# expert-parallel MoE path, which needs shard_map over the ``ep`` axis)
# can reach it without threading a mesh argument through every model
# signature. Analog of the reference's module-level _TP/_EP group
# globals (ref: vllm/distributed/parallel_state.py get_ep_group).
_CURRENT_MESH: Mesh | None = None


def set_current_mesh(mesh: Mesh | None) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_current_mesh() -> Mesh | None:
    return _CURRENT_MESH


def axis_size(axis: str) -> int:
    """Size of a named axis on the ambient mesh (1 when no mesh)."""
    return _CURRENT_MESH.shape[axis] if _CURRENT_MESH is not None else 1
