"""EAGLE speculative decoding: a one-layer draft transformer that
predicts the target's next tokens from (token embedding, target hidden
state) pairs.

Ref analog: vllm/v1/spec_decode/eagle.py (EagleProposer) +
vllm/model_executor/models/llama_eagle.py. TPU-native formulation:
the whole proposal — draft "prefill" over the step's scheduled token
stream plus the k-1 chained single-token draft steps — is ONE jitted
program; the only host traffic is the [R, k] draft-token matrix.

Draft param schema (llama-layer based, EAGLE-1):

    fc: {"weight": [2*E, E]}      # combine [embed(tok); target hidden]
    layers: [llama-layer dicts]   # usually 1; input_layernorm optional
    norm: [E]                     # optional final norm
    (embed_tokens / lm_head are shared with the target params)

Draft-stream semantics: the draft input at position ``i`` is
(token t_{i+1}, target hidden h_i) — the shifted token stream. The
draft keeps its own paged KV cache indexed by the same block tables /
slot mapping as the target, so scheduler block accounting covers it
(with ``num_lookahead_tokens`` headroom for the chained steps).

Entries written beyond the accepted length (rejected-draft positions,
chunked-prefill boundary tokens) are stale but harmless: attention
masks by seq_len, and sequence growth overwrites them position-wise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.models import llama
from vllm_tpu.ops.layers import rms_norm, rope_cos_sin
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata


def draft_forward(
    draft_params: dict,
    cfg: ModelConfig,
    tok_embeds: jax.Array,  # [T, E] embedding of the *shifted* tokens
    hidden: jax.Array,  # [T, E] target hidden states
    positions: jax.Array,  # [T]
    kv_caches: list[jax.Array],
    meta: AttentionMetadata,
    q_blk: int,
    method: str = "eagle",
) -> tuple[jax.Array, jax.Array, list[jax.Array]]:
    """One pass of the draft layer stack. Returns (head hidden [T, E],
    feedback hidden [T, E], updated draft caches). For EAGLE-3 the two
    differ: the LM head reads the post-final-norm output while the next
    chained step consumes the PRE-norm residual (ref: llama_eagle3.py
    LlamaModel.forward returns hidden_prenorm as the aux output with
    norm_output=False); feeding the post-norm state back shifts the
    draft input distribution and erodes acceptance.

    Method variants (presence-dispatched leaves, static ``method``):

    - ``eagle`` (EAGLE-1): x = fc([embed(t); h]) then llama layers.
    - ``mtp`` (DeepSeek multi-token prediction modules, ref
      vllm/model_executor/models/deepseek_mtp.py): both inputs are
      RMS-normed first (enorm/hnorm) and fc is the eh_proj; the layer
      stack itself is llama-form here.
    - ``eagle3`` (ref llama_eagle3.py LlamaDecoderLayer): no input fc —
      the single layer attends over concat(input_layernorm(embeds),
      hidden_norm(h)) [T, 2E] with a [2E, ...] qkv projection, residual
      stream stays E-wide.
    """
    cos, sin = rope_cos_sin(positions, cfg)
    new_caches = []
    if method == "eagle3":
        x = hidden
        for i, layer in enumerate(draft_params["layers"]):
            h2 = jnp.concatenate([
                rms_norm(tok_embeds, layer["input_layernorm"],
                         cfg.rms_norm_eps),
                rms_norm(x, layer["hidden_norm"], cfg.rms_norm_eps),
            ], axis=-1)
            attn_out, kvc = llama._attention(cfg, layer, h2, cos, sin,
                                             kv_caches[i], meta, q_blk)
            new_caches.append(kvc)
            x = x + attn_out
            h = rms_norm(x, layer["post_attention_layernorm"],
                         cfg.rms_norm_eps)
            x = x + llama._mlp(layer, h)
        pre = x
        if "norm" in draft_params:
            x = rms_norm(x, draft_params["norm"], cfg.rms_norm_eps)
        return x, pre, new_caches

    if method == "mtp":
        tok_embeds = rms_norm(tok_embeds, draft_params["enorm"],
                              cfg.rms_norm_eps)
        hidden = rms_norm(hidden, draft_params["hnorm"],
                          cfg.rms_norm_eps)
    x = linear(draft_params["fc"],
               jnp.concatenate([tok_embeds, hidden], axis=-1))
    for i, layer in enumerate(draft_params["layers"]):
        h = (rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
             if "input_layernorm" in layer else x)
        attn_out, kvc = llama._attention(cfg, layer, h, cos, sin,
                                         kv_caches[i], meta, q_blk)
        new_caches.append(kvc)
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        x = x + llama._mlp(layer, h)
    if "norm" in draft_params:
        x = rms_norm(x, draft_params["norm"], cfg.rms_norm_eps)
    return x, x, new_caches


def _draft_next(draft_params: dict, target_params: dict,
                dcfg: ModelConfig, h: jax.Array, temps, seeds, steps,
                column: int) -> tuple[jax.Array, jax.Array | None]:
    """Next draft token (+ its sampling distribution) from draft
    hidden states.

    EAGLE-3 drafts over a reduced draft vocabulary through its own
    lm_head and maps ids back with the d2t offset table (ref:
    llama_eagle3.py Eagle3LlamaForCausalLM.compute_logits +
    draft_id_to_target_id) — greedy point-mass only (probs=None).

    Methods sharing the target LM head (eagle, MTP) SAMPLE the draft
    at the row's temperature via the counter-based Gumbel stream and
    return q = softmax(logits/T) [R, V] so verification can run the
    p/q accept-ratio rule (ref: rejection_sampler.py draft-probs
    branch; drafts must be drawn from the q that verification uses —
    arXiv:2211.17192). Greedy rows (T == 0) keep argmax drafts."""
    if "lm_head" in draft_params and "d2t" in draft_params:
        logits = linear(draft_params["lm_head"], h)
        d = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return d + draft_params["d2t"][d].astype(jnp.int32), None
    logits = llama.compute_logits(target_params, dcfg, h)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temps is None:
        return greedy, None
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    q = jax.nn.softmax(scaled, axis=-1)

    def row_noise(seed, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        key = jax.random.fold_in(key, 15485863 + column)
        return jax.random.gumbel(key, (logits.shape[-1], ), jnp.float32)

    noise = jax.vmap(row_noise)(seeds, steps)
    sampled = jnp.argmax(scaled + noise, axis=-1).astype(jnp.int32)
    tok = jnp.where(temps > 0.0, sampled, greedy)
    return tok, q


def _propose_impl(
    dcfg: ModelConfig,
    block_size: int,
    k: int,
    method: str,
    q_blk: int,
    target_params: dict,
    draft_params: dict,
    draft_caches: list[jax.Array],
    hidden: jax.Array,  # [T, E] target hidden (this step's stream)
    input_ids: jax.Array,  # [T] scheduled tokens
    positions: jax.Array,  # [T]
    query_start_loc: jax.Array,  # [R+1]
    seq_lens: jax.Array,  # [R] post-step lengths
    slot_mapping: jax.Array,  # [T]
    block_tables: jax.Array,  # [R, max_blocks]
    next_tokens: jax.Array,  # [R] last emitted token per row
    last_idx: jax.Array,  # [R] flat index of the last *accepted* pos
    active: jax.Array,  # [R] bool — rows to draft for
    temps: jax.Array,  # [R] f32 sampling temperature (0 = greedy)
    seeds: jax.Array,  # [R] i32 per-row PRNG seed
    steps: jax.Array,  # [R] i32 per-row sampling-step counter
):
    """Returns (drafts [R, k] i32, probs [R, k, V] f32 | None,
    updated draft caches)."""
    T = input_ids.shape[0]
    R = next_tokens.shape[0]
    embed = (draft_params.get("embed_tokens")
             or target_params["embed_tokens"])["weight"]

    # Shifted stream: position i consumes token t_{i+1}; each row's
    # last-accepted position consumes the freshly emitted token.
    shifted = jnp.concatenate([input_ids[1:], input_ids[:1] * 0])
    shifted = shifted.at[last_idx].set(next_tokens)

    if method == "eagle3":
        # hidden arrives as the concatenated aux stream [T, 3E];
        # combine once per target step (ref: llama_eagle3.py
        # combine_hidden_states — fc: 3E -> E).
        hidden = linear(draft_params["fc"], hidden)

    meta = AttentionMetadata(slot_mapping=slot_mapping,
                             block_tables=block_tables,
                             query_start_loc=query_start_loc,
                             seq_lens=seq_lens)
    h_d, h_fb, draft_caches = draft_forward(draft_params, dcfg,
                                            embed[shifted], hidden,
                                            positions, draft_caches,
                                            meta, q_blk, method=method)

    cur_h = h_fb[last_idx]  # [R, E] feedback (pre-norm for eagle3)
    cur_tok, q0 = _draft_next(draft_params, target_params, dcfg,
                              h_d[last_idx], temps, seeds, steps, 0)
    drafts = [cur_tok]
    probs = [q0]
    pos = positions[last_idx] + 1  # position of the emitted token

    for i in range(k - 1):
        # Chained single-token draft step at position `pos`, consuming
        # (previous draft, previous draft hidden).
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
        h_head, cur_h, draft_caches = draft_forward(
            draft_params, dcfg, embed[cur_tok], cur_h, pos,
            draft_caches, step_meta, q_blk=1, method=method)
        cur_tok, qi = _draft_next(draft_params, target_params, dcfg,
                                  h_head, temps, seeds, steps, i + 1)
        drafts.append(cur_tok)
        probs.append(qi)
        pos = pos + 1

    probs_out = (jnp.stack(probs, axis=1)
                 if probs[0] is not None else None)  # [R, k, V]
    return jnp.stack(drafts, axis=1), probs_out, draft_caches


class EagleProposer:
    """Holds draft params + caches and the jitted proposal program.

    The runner calls :meth:`propose` once per step *after* host-side
    verification (the chained draft stream must start from the actually
    accepted token — ref: eagle.py prepare_inputs' token shift).
    """

    def __init__(self, draft_params: dict, dcfg: ModelConfig, k: int,
                 num_kv_blocks: int, block_size: int,
                 cache_dtype: str = "auto",
                 method: str = "eagle") -> None:
        from vllm_tpu.ops.kv_cache import make_kv_cache
        self.k = k
        self.dcfg = dcfg
        self.method = method
        self.last_draft_probs = None  # [R, k, V] after propose()
        self.block_size = block_size
        self.draft_params = draft_params
        self.draft_caches = [
            make_kv_cache(num_kv_blocks, block_size, dcfg.num_kv_heads,
                          dcfg.head_dim, cache_dtype, dcfg.dtype)
            for _ in range(len(draft_params["layers"]))
        ]
        self._fn = jax.jit(
            functools.partial(_propose_impl, dcfg, block_size, k,
                              method),
            static_argnums=(0, ),  # q_blk
            donate_argnums=(3, ),  # draft caches
        )

    def propose(self, target_params: dict, hidden: jax.Array,
                inputs, next_tokens: np.ndarray, last_idx: np.ndarray,
                active: np.ndarray, q_blk: int) -> np.ndarray:
        """inputs: the runner's StepInputs. Returns [R, k] int32.

        When the drafter shares the target LM head, drafts are SAMPLED
        at each row's temperature and ``last_draft_probs`` holds the
        [R, k, V] distributions for the verifier's p/q accept rule
        (stays on device; None for the EAGLE-3 reduced-vocab head)."""
        s = inputs.sampling
        drafts, probs, self.draft_caches = self._fn(
            q_blk, target_params, self.draft_params, self.draft_caches,
            hidden, inputs.input_ids, inputs.positions,
            inputs.query_start_loc, inputs.seq_lens, inputs.slot_mapping,
            inputs.block_tables, jnp.asarray(next_tokens),
            jnp.asarray(last_idx), jnp.asarray(active),
            s.temperature, s.seeds, s.steps)
        self.last_draft_probs = probs
        return np.asarray(jax.device_get(drafts))


def draft_config_from_target(target: ModelConfig,
                             num_layers: int = 1) -> ModelConfig:
    """Draft config: same dims as the target, fewer layers."""
    import dataclasses
    return dataclasses.replace(target, num_layers=num_layers)


def random_draft_params(dcfg: ModelConfig, seed: int = 0) -> dict:
    """Random EAGLE draft weights (tests / dummy-load parity)."""
    dtype = jnp.dtype(dcfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = dcfg.hidden_size

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    base = llama.random_params(dcfg, seed=seed + 1)
    layers = base["layers"]
    for layer in layers:
        del layer["input_layernorm"]  # EAGLE-1: fc output goes straight in
    return {
        "fc": {"weight": w((2 * E, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }


def default_aux_layers(target: ModelConfig) -> tuple[int, int, int]:
    """EAGLE-3 target taps: layers (2, N//2, N-3) — the reference's
    default when the draft config carries no
    eagle_aux_hidden_state_layer_ids (ref: llama.py
    get_eagle3_aux_hidden_state_layers)."""
    n = target.num_layers
    taps = (min(2, n - 1), max(n // 2, 1) if n > 1 else 0, max(n - 3, 0))
    return tuple(sorted(taps))


def random_eagle3_params(dcfg: ModelConfig, seed: int = 0,
                         draft_vocab: int | None = None) -> dict:
    """Random EAGLE-3 draft weights: fc [3E, E] combiner, one 2E-input
    decoder layer with hidden_norm, and a reduced-vocab draft head with
    a d2t id-offset table."""
    import numpy as np
    dtype = jnp.dtype(dcfg.dtype)
    E = dcfg.hidden_size
    dv = draft_vocab or dcfg.vocab_size
    rng = np.random.default_rng(seed)

    def w(shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    base = llama.random_params(dcfg, seed=seed + 1)
    layers = base["layers"][:1]
    for layer in layers:
        H, KH, D = dcfg.num_heads, dcfg.num_kv_heads, dcfg.head_dim
        layer["qkv_proj"] = {"weight": w((2 * E, (H + 2 * KH) * D))}
        layer["hidden_norm"] = jnp.ones((E, ), dtype)
    # d2t: sorted offsets keep target ids strictly increasing in the
    # draft id (any non-negative offsets work for tests).
    d2t = np.sort(rng.integers(0, dcfg.vocab_size - dv + 1, size=(dv, )))
    return {
        "fc": {"weight": w((3 * E, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
        "lm_head": {"weight": w((E, dv))},
        "d2t": jnp.asarray(d2t, jnp.int32),
    }


def random_mtp_params(dcfg: ModelConfig, seed: int = 0) -> dict:
    """Random MTP-module weights (enorm/hnorm/eh_proj + llama-form
    layer; shares embed/lm_head with the target)."""
    dtype = jnp.dtype(dcfg.dtype)
    E = dcfg.hidden_size
    params = random_draft_params(dcfg, seed=seed)
    params["enorm"] = jnp.ones((E, ), dtype)
    params["hnorm"] = jnp.ones((E, ), dtype)
    return params


def load_eagle3_params(path: str, dcfg: ModelConfig) -> dict:
    """Load an EAGLE-3 draft checkpoint (ref layout: yuhuili/EAGLE3-*
    + vllm llama_eagle3.py — ``midlayer.*`` decoder weights incl.
    hidden_norm, ``fc`` 3E->E combiner stored [E, 3E], reduced-vocab
    ``lm_head`` and the ``d2t`` id-offset table). If the checkpoint
    directory carries a config.json with
    ``eagle_aux_hidden_state_layer_ids``, the tap layers are returned
    under the host-side ``_aux_layers`` key (popped before the params
    enter the jitted pytree)."""
    import json
    import os

    import numpy as np
    from vllm_tpu.loader.safetensors_loader import _iter_safetensors
    dtype = jnp.dtype(dcfg.dtype)
    layer: dict = {}
    params: dict = {"layers": [layer]}
    cfg_path = os.path.join(path if os.path.isdir(path)
                            else os.path.dirname(path), "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        taps = raw.get("eagle_aux_hidden_state_layer_ids")
        if taps:
            params["_aux_layers"] = tuple(int(i) for i in taps)
    pending: dict[tuple[str, str], dict[int, np.ndarray]] = {}
    fused = {
        "self_attn.q_proj": ("qkv_proj", 0, 3),
        "self_attn.k_proj": ("qkv_proj", 1, 3),
        "self_attn.v_proj": ("qkv_proj", 2, 3),
        "mlp.gate_proj": ("gate_up_proj", 0, 2),
        "mlp.up_proj": ("gate_up_proj", 1, 2),
    }
    direct = {"self_attn.o_proj": "o_proj", "mlp.down_proj": "down_proj"}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(path):
        if name.startswith("model."):
            name = name[len("model."):]
        if name == "d2t":
            params["d2t"] = jnp.asarray(np.asarray(w), jnp.int32)
        elif name == "t2d":
            pass  # only needed for training-time target mapping
        elif name == "fc.weight":
            params["fc"] = {"weight": to_jax(w.T)}
        elif name in ("norm.weight", "final_norm.weight"):
            params["norm"] = to_jax(w)
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": to_jax(w.T)}
        elif name == "embed_tokens.weight":
            params["embed_tokens"] = {"weight": to_jax(w)}
        elif name.startswith(("midlayer.", "layers.0.")):
            tail = name.split(".", 1)[1]
            if tail.startswith("0."):
                tail = tail[2:]
            if tail in ("input_layernorm.weight", "hidden_norm.weight",
                        "post_attention_layernorm.weight"):
                layer[tail.rsplit(".", 1)[0]] = to_jax(w)
            else:
                mod, _, kind = tail.rpartition(".")
                if mod in direct:
                    leaf = layer.setdefault(direct[mod], {})
                    leaf["weight" if kind == "weight" else "bias"] = (
                        to_jax(w.T) if kind == "weight" else to_jax(w))
                elif mod in fused:
                    leaf_name, slot, _n = fused[mod]
                    pending.setdefault((leaf_name, kind), {})[slot] = w
    for (leaf_name, kind), slots in pending.items():
        n = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n)], axis=0)
        leaf = layer.setdefault(leaf_name, {})
        if kind == "weight":
            leaf["weight"] = to_jax(cat.T)
        else:
            leaf["bias"] = to_jax(cat)
    return params


def load_mtp_params(path: str, dcfg: ModelConfig) -> dict:
    """Load a DeepSeek-style MTP module (ref:
    vllm/model_executor/models/deepseek_mtp.py — enorm/hnorm/eh_proj +
    one decoder layer under ``model.layers.<N>.`` where N is the
    target's layer count; embed/lm_head shared with the target). The
    MTP checkpoint's layer index is remapped to draft layer 0 and the
    layer stack is loaded in llama form. Unrecognized weight names are
    collected and reported if the loaded layer is incomplete, instead
    of surfacing later as an opaque KeyError inside the jitted
    forward."""
    import numpy as np
    from vllm_tpu.loader.safetensors_loader import _iter_safetensors
    dtype = jnp.dtype(dcfg.dtype)
    layer: dict = {}
    params: dict = {"layers": [layer]}
    unmatched: list[str] = []
    pending: dict[tuple[str, str], dict[int, np.ndarray]] = {}
    fused = {
        "self_attn.q_proj": ("qkv_proj", 0, 3),
        "self_attn.k_proj": ("qkv_proj", 1, 3),
        "self_attn.v_proj": ("qkv_proj", 2, 3),
        "mlp.gate_proj": ("gate_up_proj", 0, 2),
        "mlp.up_proj": ("gate_up_proj", 1, 2),
    }
    direct = {"self_attn.o_proj": "o_proj", "mlp.down_proj": "down_proj"}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(path):
        if name.startswith("model."):
            name = name[len("model."):]
        if name.startswith("layers."):
            name = name.split(".", 2)[2]  # drop the layer index
        if name == "enorm.weight":
            params["enorm"] = to_jax(w)
        elif name == "hnorm.weight":
            params["hnorm"] = to_jax(w)
        elif name == "eh_proj.weight":
            params["fc"] = {"weight": to_jax(w.T)}
        elif name in ("shared_head.norm.weight", "norm.weight"):
            params["norm"] = to_jax(w)
        elif name in ("input_layernorm.weight",
                      "post_attention_layernorm.weight"):
            layer[name.rsplit(".", 1)[0]] = to_jax(w)
        elif name.endswith((".weight", ".bias")):
            mod, _, kind = name.rpartition(".")
            if mod in direct:
                leaf = layer.setdefault(direct[mod], {})
                leaf["weight" if kind == "weight" else "bias"] = (
                    to_jax(w.T) if kind == "weight" else to_jax(w))
            elif mod in fused:
                leaf_name, slot, _n = fused[mod]
                pending.setdefault((leaf_name, kind), {})[slot] = w
            else:
                unmatched.append(name)
        else:
            unmatched.append(name)
    for (leaf_name, kind), slots in pending.items():
        n = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n)], axis=0)
        leaf = layer.setdefault(leaf_name, {})
        if kind == "weight":
            leaf["weight"] = to_jax(cat.T)
        else:
            leaf["bias"] = to_jax(cat)
    required = {"qkv_proj", "o_proj", "gate_up_proj", "down_proj"}
    missing = sorted(required - set(layer)) + sorted(
        k for k in ("enorm", "hnorm", "fc") if k not in params)
    if missing:
        raise ValueError(
            f"MTP checkpoint {path!r} left the draft layer incomplete: "
            f"missing {missing}. This loader handles llama-form MTP "
            f"modules (q/k/v/o + gate/up/down + enorm/hnorm/eh_proj); "
            f"unmatched checkpoint keys: {sorted(set(unmatched))[:20]}")
    return params


def load_eagle_params(path: str, dcfg: ModelConfig) -> dict:
    """Load an EAGLE draft checkpoint (fc.weight + llama layer keys,
    with or without a ``model.`` prefix — ref: yuhuili/EAGLE-*
    layout, vllm llama_eagle.py load_weights)."""
    from vllm_tpu.loader.safetensors_loader import _iter_safetensors
    dtype = jnp.dtype(dcfg.dtype)
    layers: list[dict] = [dict() for _ in range(dcfg.num_layers)]
    params: dict = {"layers": layers}
    pending: dict[tuple[int, str, str], dict[int, np.ndarray]] = {}
    fused = {
        "self_attn.q_proj": ("qkv_proj", 0, 3),
        "self_attn.k_proj": ("qkv_proj", 1, 3),
        "self_attn.v_proj": ("qkv_proj", 2, 3),
        "mlp.gate_proj": ("gate_up_proj", 0, 2),
        "mlp.up_proj": ("gate_up_proj", 1, 2),
    }
    direct = {"self_attn.o_proj": "o_proj", "mlp.down_proj": "down_proj"}

    def to_jax(a):
        return jnp.asarray(a).astype(dtype)

    for name, w in _iter_safetensors(path):
        if name.startswith("model."):
            name = name[len("model."):]
        if name == "fc.weight":
            params["fc"] = {"weight": to_jax(w.T)}
        elif name == "fc.bias":
            params.setdefault("fc", {})["bias"] = to_jax(w)
        elif name in ("norm.weight", "final_norm.weight"):
            params["norm"] = to_jax(w)
        elif name in ("embed_tokens.weight", "lm_head.weight"):
            pass  # shared with the target
        elif name.startswith("layers."):
            rest = name[len("layers."):]
            idx_s, _, tail = rest.partition(".")
            layer = layers[int(idx_s)]
            if tail == "input_layernorm.weight":
                layer["input_layernorm"] = to_jax(w)
            elif tail == "post_attention_layernorm.weight":
                layer["post_attention_layernorm"] = to_jax(w)
            else:
                mod, _, kind = tail.rpartition(".")
                if mod in direct:
                    leaf = layer.setdefault(direct[mod], {})
                    leaf["weight" if kind == "weight" else "bias"] = (
                        to_jax(w.T) if kind == "weight" else to_jax(w))
                elif mod in fused:
                    leaf_name, slot, _n = fused[mod]
                    pending.setdefault((int(idx_s), leaf_name, kind),
                                       {})[slot] = w
    for (li, leaf_name, kind), slots in pending.items():
        n = 3 if leaf_name == "qkv_proj" else 2
        cat = np.concatenate([slots[i] for i in range(n)], axis=0)
        leaf = layers[li].setdefault(leaf_name, {})
        if kind == "weight":
            leaf["weight"] = to_jax(cat.T)
        else:
            leaf["bias"] = to_jax(cat)
    return params
