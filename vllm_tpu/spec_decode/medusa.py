"""Medusa speculative decoding: K independent draft heads, each a
residual-MLP block + LM head over the target's final hidden state.

Ref analog: vllm/v1/spec_decode/medusa.py (MedusaProposer:18) +
vllm/model_executor/models/medusa.py (Medusa:41). Head i predicts the
token at offset i+1 past the sampled token; all heads read the SAME
hidden state, so proposal is one batched device call with no draft KV
cache and no chaining — the cheapest device drafter.

Param schema::

    blocks: [ [ {"weight": [E, E], "bias": [E]} x num_layers ] x K ]
    lm_heads: [ {"weight": [E, V]} x K ]   # or one shared entry

Old-format Medusa checkpoints (FasterDecoding/medusa-*) name these
``{head}.{layer}.linear.{weight,bias}`` / ``{head}.{N}.weight``; the
loader remaps both layouts (ref: medusa.py _remap_old_checkpoint_key).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.linear import linear


def _head_forward(block: list[dict], lm_head: dict,
                  h: jax.Array) -> jax.Array:
    """One Medusa head: residual SiLU-MLP stack, then logits.
    Ref: medusa.py ResidualBlock.forward (x + silu(linear(x)))."""
    for layer in block:
        h = h + jax.nn.silu(linear(layer, h))
    return linear(lm_head, h).astype(jnp.float32)


def _propose_impl(params: dict, h: jax.Array,
                  last_idx: jax.Array) -> jax.Array:
    """hidden [T, E] + last-accepted flat indices [R] -> drafts [R, K]
    (greedy argmax per head, matching the reference's propose())."""
    hr = h[last_idx]  # [R, E]
    heads = params["lm_heads"]
    drafts = []
    for i, block in enumerate(params["blocks"]):
        head = heads[i] if len(heads) > 1 else heads[0]
        logits = _head_forward(block, head, hr)
        drafts.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return jnp.stack(drafts, axis=1)  # [R, K]


class MedusaProposer:
    """Runner-facing proposer with the EagleProposer.propose signature
    (the runner drives every device drafter through one code path);
    ignores the token stream / draft caches — Medusa is stateless."""

    def __init__(self, params: dict, k: int) -> None:
        if len(params["blocks"]) < k:
            raise ValueError(
                f"medusa checkpoint has {len(params['blocks'])} heads; "
                f"num_speculative_tokens={k} needs at least that many")
        self.params = {
            "blocks": params["blocks"][:k],
            "lm_heads": (params["lm_heads"][:k]
                         if len(params["lm_heads"]) > 1
                         else params["lm_heads"]),
        }
        self._fn = jax.jit(_propose_impl)

    def propose(self, target_params: dict, hidden: jax.Array,
                inputs, next_tokens: np.ndarray, last_idx: np.ndarray,
                active: np.ndarray, q_blk: int) -> np.ndarray:
        drafts = self._fn(self.params, hidden, jnp.asarray(last_idx))
        return np.asarray(jax.device_get(drafts))


def random_medusa_params(cfg: ModelConfig, k: int, num_layers: int = 1,
                         seed: int = 0) -> dict:
    """Random Medusa heads (tests / dummy-load parity)."""
    dtype = jnp.dtype(cfg.dtype)
    rng = np.random.default_rng(seed)
    E, V = cfg.hidden_size, cfg.vocab_size

    def w(shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    return {
        "blocks": [[{"weight": w((E, E)), "bias": w((E, ), 0.0)}
                    for _ in range(num_layers)] for _ in range(k)],
        "lm_heads": [{"weight": w((E, V))} for _ in range(k)],
    }


def load_medusa_params(path: str, cfg: ModelConfig) -> dict:
    """Load a Medusa checkpoint. Handles both the new layout
    (``blocks.{h}.layers.{l}.{weight,bias}`` + ``lm_heads.{h}.weight``)
    and the old FasterDecoding layout (``{h}.{l}.linear.*`` +
    ``{h}.{N}.weight`` — ref: medusa.py _remap_old_checkpoint_key:140),
    with or without a ``medusa_heads.`` / ``model.`` prefix."""
    from vllm_tpu.loader.safetensors_loader import _iter_safetensors
    dtype = jnp.dtype(cfg.dtype)
    blocks: dict[int, dict[int, dict]] = {}
    lm_heads: dict[int, dict] = {}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(path):
        for prefix in ("model.", "medusa_heads."):
            if name.startswith(prefix):
                name = name[len(prefix):]
        parts = name.split(".")
        if parts[0] == "blocks":
            # blocks.{h}.layers.{l}.{weight|bias}
            h, l, kind = int(parts[1]), int(parts[3]), parts[4]
            leaf = blocks.setdefault(h, {}).setdefault(l, {})
            leaf[kind] = to_jax(w.T) if kind == "weight" else to_jax(w)
        elif parts[0] == "lm_heads" or parts[0] == "lm_head":
            h = int(parts[1]) if parts[0] == "lm_heads" else 0
            lm_heads[h] = {"weight": to_jax(w.T)}
        elif parts[0].isdigit():
            h = int(parts[0])
            if parts[-1] == "weight" and parts[-2].isdigit() and \
                    len(parts) == 3:
                # old format: {h}.{N}.weight == the head's lm_head
                lm_heads[h] = {"weight": to_jax(w.T)}
            elif len(parts) >= 3 and parts[2] == "linear":
                l, kind = int(parts[1]), parts[3]
                leaf = blocks.setdefault(h, {}).setdefault(l, {})
                leaf[kind] = (to_jax(w.T) if kind == "weight"
                              else to_jax(w))
    if not blocks:
        raise ValueError(f"no Medusa head weights found in {path!r}")
    return {
        "blocks": [[blocks[h][l] for l in sorted(blocks[h])]
                   for h in sorted(blocks)],
        "lm_heads": [lm_heads[h] for h in sorted(lm_heads)],
    }
