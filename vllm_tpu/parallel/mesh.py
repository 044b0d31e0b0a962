"""Device mesh with named axes — the TPU-native GroupCoordinator.

The reference builds one NCCL process group per parallel strategy
(ref: vllm/distributed/parallel_state.py initialize_model_parallel():
1742, _TP/_PP/_DP/_EP/_DCP/_PCP). On TPU all of that collapses into
named axes of a single ``jax.sharding.Mesh``; XLA emits the ICI/DCN
collectives from sharding annotations (SURVEY.md §2.6 TPU-native
equivalent).

Axis order is (dp, ep, pp, tp): tp innermost so tensor-parallel
collectives ride the fastest ICI links.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from vllm_tpu.config import ParallelConfig

AXIS_DP = "dp"
AXIS_EP = "ep"
AXIS_PP = "pp"
AXIS_TP = "tp"
AXES = (AXIS_DP, AXIS_EP, AXIS_PP, AXIS_TP)


def make_mesh(parallel: ParallelConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dp, ep, pp, tp = (parallel.data_parallel_size,
                      parallel.expert_parallel_size,
                      parallel.pipeline_parallel_size,
                      parallel.tensor_parallel_size)
    want = dp * ep * pp * tp
    if want > len(devices):
        raise ValueError(f"mesh {dp}x{ep}x{pp}x{tp} needs {want} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:want]).reshape(dp, ep, pp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1), AXES)
