"""EPLB — expert-parallel load balancing.

Ref analog: vllm/distributed/eplb/ (EplbState, rebalance_experts in
rebalance_algo.py, weight rearrangement in rebalance_execute.py) and
the EPLBConfig knobs (vllm/config/parallel.py). The reference tracks
per-expert token load over a sliding window and periodically recomputes
an expert *placement*: every logical expert gets >= 1 physical replica,
hot experts get extra (redundant) replicas, and physical experts are
packed onto EP ranks so per-rank load evens out.

TPU-native formulation:

- **Placement is data, not topology.** The stacked expert tensors in
  the params pytree become *physical* stacks ``[E_phys, ...]``; a small
  ``eplb`` leaf per MoE layer carries ``log_to_phys [E, R]`` /
  ``replica_counts [E]`` and rides the pytree into the jitted step, so
  a rebalance only changes *values* — no recompile, no new program.
  Routing translates logical expert ids to physical ids on device
  (round-robin over an expert's replicas by assignment index).
- **Rearrangement is a gather.** A new placement regathers the
  physical stacks along the expert axis (``new[i] = cur[src[i]]``
  where ``src`` maps each new physical slot to any current replica of
  its logical expert). Under EP the stacks are GSPMD-sharded on that
  axis, so the gather IS the cross-rank weight movement — XLA emits
  the collective (the reference hand-codes P2P sends in
  rebalance_execute.py).
- **Load stats stream out of jit** via ``io_callback`` (per-layer
  logical-expert bincounts), EMA-accumulated on host — the analog of
  the reference's expert_load_view buffers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


def rebalance_placement(load: np.ndarray, num_physical: int,
                        ep: int) -> tuple[np.ndarray, np.ndarray]:
    """Compute a physical placement from per-logical-expert load.

    Returns (phys_to_log [num_physical], rank_of_phys [num_physical])
    with physical slot p on EP rank ``p // (num_physical // ep)``.

    Greedy equivalent of the reference's rebalance_algo.py: (1) every
    logical expert gets one replica, the ``num_physical - E`` spares go
    to the heaviest per-replica loads; (2) replicas are packed onto
    ranks heaviest-first onto the least-loaded rank with free capacity.
    """
    E = len(load)
    assert num_physical >= E and num_physical % ep == 0
    cap = num_physical // ep
    load = load.astype(np.float64) + 1e-9
    counts = np.ones(E, np.int64)
    for _ in range(num_physical - E):
        counts[np.argmax(load / counts)] += 1
    # Replica loads, heaviest first.
    items = []  # (per-replica load, logical id)
    for e in range(E):
        items += [(load[e] / counts[e], e)] * int(counts[e])
    items.sort(key=lambda t: -t[0])
    rank_load = np.zeros(ep)
    rank_fill = np.zeros(ep, np.int64)
    assign: list[list[int]] = [[] for _ in range(ep)]
    for w, e in items:
        free = [r for r in range(ep) if rank_fill[r] < cap]
        r = min(free, key=lambda r: rank_load[r])
        assign[r].append(e)
        rank_load[r] += w
        rank_fill[r] += 1
    phys_to_log = np.concatenate([np.asarray(a, np.int64) for a in assign])
    rank_of_phys = np.repeat(np.arange(ep), cap)
    return phys_to_log, rank_of_phys


def maps_from_placement(phys_to_log: np.ndarray,
                        num_logical: int) -> tuple[np.ndarray, np.ndarray]:
    """(log_to_phys [E, R] padded with replica 0's slot, counts [E])."""
    counts = np.bincount(phys_to_log, minlength=num_logical)
    R = int(counts.max())
    l2p = np.zeros((num_logical, R), np.int32)
    seen = np.zeros(num_logical, np.int64)
    for p, e in enumerate(phys_to_log):
        l2p[e, seen[e]] = p
        seen[e] += 1
    for e in range(num_logical):  # pad tail with the first replica
        l2p[e, seen[e]:] = l2p[e, 0]
    return l2p, counts.astype(np.int32)


def translate_expert_ids(expert_ids: jax.Array, eplb: dict) -> jax.Array:
    """Logical [T, K] -> physical ids, round-robin over replicas by
    assignment index (ref analog: the logical->physical indirection of
    eplb_state; the reference balances replicas the same cheap way)."""
    l2p = eplb["log_to_phys"]  # [E, R] i32
    counts = eplb["replica_counts"]  # [E] i32
    shape = expert_ids.shape
    flat = expert_ids.reshape(-1)
    slot = jnp.arange(flat.shape[0], dtype=jnp.int32) % jnp.maximum(
        counts[flat], 1)
    return l2p[flat, slot].reshape(shape)


@dataclass
class EplbState:
    """Host-side load tracking + rebalance cadence (ref analog:
    EplbState, vllm/distributed/eplb/eplb_state.py)."""
    num_logical: int
    num_layers: int
    window: int = 1000
    step_interval: int = 100
    ema: np.ndarray = field(init=False)
    steps: int = 0
    rebalances: int = 0

    def __post_init__(self) -> None:
        self.ema = np.zeros((self.num_layers, self.num_logical))

    def record(self, layer_idx: int, counts: np.ndarray) -> None:
        alpha = 1.0 / max(self.window, 1)
        self.ema[layer_idx] = ((1 - alpha) * self.ema[layer_idx] +
                               alpha * counts)

    def should_rebalance(self) -> bool:
        self.steps += 1
        return self.steps % self.step_interval == 0

    def balancedness(self) -> float:
        """mean(load) / max(load) per layer, averaged — 1.0 is perfect
        (the reference logs the same ratio)."""
        tot = self.ema.sum(axis=1, keepdims=True)
        if not tot.any():
            return 1.0
        mx = self.ema.max(axis=1)
        mean = self.ema.mean(axis=1)
        ok = mx > 0
        return float(np.mean(np.where(ok, mean / np.maximum(mx, 1e-9),
                                      1.0)))


# Host-side balancer the jitted step streams load counts to. Installed
# by the engine when enable_eplb is on (analog of the reference's
# process-global EplbState reached through the model runner).
_ACTIVE_STATE: EplbState | None = None


def set_active_state(state: EplbState | None) -> None:
    global _ACTIVE_STATE
    _ACTIVE_STATE = state


def get_active_state() -> EplbState | None:
    return _ACTIVE_STATE


def maybe_record_load(layer_idx: jax.Array, expert_ids: jax.Array,
                      num_logical: int) -> None:
    """Stream this step's logical routing counts to the host state
    (called inside jit; ordered=False keeps it off the critical path).
    A no-op unless a balancer was installed *before* trace time."""
    if _ACTIVE_STATE is None:
        return
    counts = jnp.bincount(expert_ids.reshape(-1), length=num_logical)

    def _cb(li, c):
        state = _ACTIVE_STATE
        if state is not None:
            state.record(int(li), np.asarray(c))

    jax.experimental.io_callback(_cb, None, layer_idx, counts,
                                 ordered=False)
