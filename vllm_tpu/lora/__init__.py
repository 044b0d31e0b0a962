"""Multi-LoRA runtime: adapter registry + stacked device tensors.

Ref analog: vllm/lora/ (LoRAModel/LoRAModelManager model_manager.py,
punica SGMV/BGMV batched-apply kernels, worker mixin
lora_model_runner_mixin.py). TPU-first design: adapters live as
*stacked* per-leaf tensors

    A: [L+1, K, r_max]   B: [L+1, r_max, N]   scale: [L+1]

with slot 0 the zero "no adapter" entry, so a mixed batch applies all
adapters with L tiny dense matmuls + a per-row select — fully static
shapes, no scatter/gather kernels (see ops/lora.py). Adapters load
from PEFT safetensors checkpoints (lora_A/lora_B naming).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

# Leaf name -> the (merged) checkpoint modules it covers, in fusion
# order. Mirrors quant/loader._FUSE.
_TARGETS = {
    "qkv_proj": ("q_proj", "k_proj", "v_proj"),
    "o_proj": ("o_proj", ),
    "gate_up_proj": ("gate_proj", "up_proj"),
    "down_proj": ("down_proj", ),
}


@dataclass
class LoRAAdapter:
    """One adapter's host-side tensors, keyed (layer_idx, leaf_name)."""
    name: str
    rank: int
    scaling: float
    # (layer, leaf) -> (A [K, r], B [r, N])
    tensors: dict[tuple[int, str], tuple[np.ndarray, np.ndarray]] = \
        field(default_factory=dict)


def load_peft_adapter(name: str, path: str) -> LoRAAdapter:
    """Read a PEFT LoRA checkpoint (adapter_config.json +
    adapter_model.safetensors)."""
    import json
    import os

    from vllm_tpu.loader.safetensors_loader import _iter_safetensors
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    rank = int(cfg["r"])
    alpha = float(cfg.get("lora_alpha", rank))
    adapter = LoRAAdapter(name, rank, alpha / rank)
    # module -> {"A": [r, K], "B": [N, r]} (PEFT stores torch [out, in])
    staging: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    for tname, w in _iter_safetensors(path):
        # ...model.layers.N.self_attn.q_proj.lora_A.weight
        if ".layers." not in tname or ".lora_" not in tname:
            continue
        rest = tname.split(".layers.")[1]
        li = int(rest.split(".")[0])
        mod = rest.split(".")[-3]  # q_proj etc.
        kind = "A" if ".lora_A." in tname else "B"
        staging.setdefault((li, mod), {})[kind] = np.asarray(
            w, np.float32)
    for (li, mod), ab in staging.items():
        if "A" not in ab or "B" not in ab:
            continue
        adapter.tensors[(li, mod)] = (ab["A"].T, ab["B"].T)  # [K,r],[r,N]
    if not adapter.tensors:
        raise ValueError(f"no LoRA tensors found under {path}")
    return adapter


def from_arrays(name: str, rank: int, scaling: float,
                tensors: dict) -> LoRAAdapter:
    """Build an adapter from in-memory {(layer, module): (A, B)}."""
    a = LoRAAdapter(name, rank, scaling)
    a.tensors = {
        k: (np.asarray(v[0], np.float32), np.asarray(v[1], np.float32))
        for k, v in tensors.items()
    }
    return a


class LoRARegistry:
    """Stacks registered adapters into per-(layer, leaf) device arrays.

    Slot 0 is the all-zero no-adapter entry; request.lora_name resolves
    to a slot id carried per batch row (ref analog: the LoRA id in
    vllm's InputBatch + punica indices)."""

    def __init__(self, num_layers: int, max_loras: int = 8,
                 model_config=None) -> None:
        self.num_layers = num_layers
        self.max_loras = max_loras
        # Per-leaf sub-module output widths (fused leaves concatenate
        # along N); needed to place B blocks when an adapter covers
        # only a subset of a fused leaf's modules.
        self._widths: dict[str, tuple[int, ...]] = {}
        if model_config is not None:
            mc = model_config
            hd = mc.num_heads * mc.head_dim
            kvd = mc.num_kv_heads * mc.head_dim
            self._widths = {
                "qkv_proj": (hd, kvd, kvd),
                "o_proj": (mc.hidden_size, ),
                "gate_up_proj": (mc.intermediate_size,
                                 mc.intermediate_size),
                "down_proj": (mc.hidden_size, ),
            }
        self.adapters: dict[str, int] = {}  # name -> slot (1-based)
        self._host: list[Optional[LoRAAdapter]] = [None] * (max_loras + 1)
        self._stacks: Optional[dict] = None  # built lazily

    def add(self, adapter: LoRAAdapter) -> int:
        if adapter.name in self.adapters:
            return self.adapters[adapter.name]
        # First free slot (slots recycle after remove()).
        used = set(self.adapters.values())
        slot = next((s for s in range(1, self.max_loras + 1)
                     if s not in used), None)
        if slot is None:
            raise ValueError(f"max_loras={self.max_loras} exceeded")
        self.adapters[adapter.name] = slot
        self._host[slot] = adapter
        self._stacks = None
        logger.info("registered LoRA %r in slot %d (rank %d)",
                    adapter.name, slot, adapter.rank)
        return slot

    def remove(self, name: str) -> None:
        """Unload an adapter and free its slot (ref analog:
        LoRAModelManager.remove_adapter). The stacks rebuild with the
        slot zeroed, so rows carrying the dead slot fall back to the
        base model."""
        slot = self.adapters.pop(name, None)
        if slot is None:
            raise KeyError(f"unknown LoRA adapter {name!r}")
        self._host[slot] = None
        self._stacks = None
        logger.info("unloaded LoRA %r (slot %d freed)", name, slot)

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        if name not in self.adapters:
            raise KeyError(f"unknown LoRA adapter {name!r}")
        return self.adapters[name]

    @property
    def enabled(self) -> bool:
        return bool(self.adapters)

    def stacks(self, params: dict) -> dict:
        """[(layer, leaf)] -> {"A": [L+1, K, r], "B": [L+1, r, N],
        "scale": [L+1]} device arrays, shapes taken from the model
        params (K/N per leaf; PEFT modules concatenated to match the
        fused leaves)."""
        if self._stacks is not None:
            return self._stacks
        import jax.numpy as jnp
        # Highest slot in use, NOT the adapter count: remove() leaves
        # holes and later slots must stay addressable.
        L = max(self.adapters.values(), default=0)
        # Fused leaves (qkv, gate_up): each sub-module's adapter
        # concatenates along r with a block-diagonal B, so
        # x @ A_cat @ B_blockdiag == [x A_q B_q | x A_k B_k | ...]
        # exactly. r_max = widest total rank across adapters per leaf.
        out: dict = {}
        for li in range(self.num_layers):
            layer_params = params["layers"][li]
            for leaf_name, mods in _TARGETS.items():
                if leaf_name not in layer_params:
                    continue
                touched = any(
                    (li, m) in a.tensors
                    for a in self._host[1:L + 1] if a for m in mods)
                if not touched:
                    continue
                K, N = _leaf_kn(layer_params[leaf_name])
                r_tot = [
                    sum(a.tensors[(li, m)][0].shape[1] for m in mods
                        if (li, m) in a.tensors)
                    for a in self._host[1:L + 1] if a
                ]
                r_max = max(max(r_tot, default=1), 1)
                A = np.zeros((L + 1, K, r_max), np.float32)
                B = np.zeros((L + 1, r_max, N), np.float32)
                scale = np.zeros((L + 1, ), np.float32)
                for slot in range(1, L + 1):
                    a = self._host[slot]
                    if a is None:
                        continue
                    scale[slot] = a.scaling
                    widths = self._widths.get(
                        leaf_name, (N // len(mods), ) * len(mods))
                    n_off = 0
                    r_off = 0
                    for m, width in zip(mods, widths):
                        ab = a.tensors.get((li, m))
                        if ab is not None:
                            Am, Bm = ab
                            r = Am.shape[1]
                            assert Bm.shape[1] == width, (m, Bm.shape)
                            A[slot, :, r_off:r_off + r] = Am
                            B[slot, r_off:r_off + r,
                              n_off:n_off + width] = Bm
                            r_off += r
                        n_off += width
                out[(li, leaf_name)] = {
                    "A": jnp.asarray(A, jnp.bfloat16),
                    "B": jnp.asarray(B, jnp.bfloat16),
                    "scale": jnp.asarray(scale),
                }
        self._stacks = out
        return out


def _leaf_kn(leaf: dict) -> tuple[int, int]:
    if "weight" in leaf:
        w = leaf["weight"]
        return w.shape[0], w.shape[1]
    qw = leaf["qweight"]
    scales = leaf["scales"]
    if qw.ndim == 4:  # tile-major prepack
        n_n, n_k, half, bn = qw.shape
        return n_k * half * 2, n_n * bn
    if qw.dtype.name == "uint8":  # half-split packed
        return qw.shape[0] * 2, qw.shape[1]
    return qw.shape[0], qw.shape[1]
