"""LLaVA-family vision-language model.

Capability parity target: ref vllm/model_executor/models/llava.py
(LlavaForConditionalGeneration) — CLIP vision tower + 2-layer
projector + llama language model. Engine contract: the prompt arrives
with the image token *pre-expanded* to one token per patch (the
processor's replacement step, ref llava input mapper); the runner
encodes images once per request and passes (mm_buffer, mm_rows) so
image positions read projected patch embeddings instead of the token
embedding table.

Param schema: llama leaves at top level (embed_tokens/layers/norm/
lm_head — llama.forward consumes them directly) plus:
    vision_tower: see models/vision.py
    projector:    linear_1/linear_2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models import llama
from vllm_tpu.models.llama import compute_logits  # noqa: F401
from vllm_tpu.models.vision import clip_encode, project
from vllm_tpu.ops.metadata import AttentionMetadata


def num_patches(cfg: ModelConfig) -> int:
    v = cfg.vision
    return (v["image_size"] // v["patch_size"])**2


def encode_images(params: dict, cfg: ModelConfig,
                  pixels: jax.Array) -> jax.Array:
    """[N, 3, H, W] -> projected patch embeddings [N, P, E]."""
    v = cfg.vision

    def one(px):
        feats = clip_encode(params["vision_tower"], px,
                            patch=v["patch_size"],
                            num_heads=v["num_heads"],
                            feature_layer=v.get("feature_layer", -2),
                            eps=v.get("layer_norm_eps", 1e-5))
        return project(params["projector"], feats)

    return jax.vmap(one)(pixels)


def merge_embeds(params: dict, input_ids: jax.Array,
                 mm_buffer: jax.Array, mm_rows: jax.Array) -> jax.Array:
    """Token embeds with image-patch rows substituted.

    mm_rows[t] >= 0 indexes into mm_buffer [Pbuf, E]; -1 = text token.
    """
    embeds = params["embed_tokens"]["weight"][input_ids]
    img = mm_buffer[jnp.clip(mm_rows, 0, mm_buffer.shape[0] - 1)]
    return jnp.where((mm_rows >= 0)[:, None], img.astype(embeds.dtype),
                     embeds)


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list[jax.Array],
    meta: AttentionMetadata,
    q_blk: int = 128,
    mm_buffer=None,  # [Pbuf, E] projected patch embeddings
    mm_rows=None,  # [T] int32 buffer row per token (-1 = text)
    **kw,
) -> tuple[jax.Array, list[jax.Array]]:
    input_embeds = None
    if mm_buffer is not None:
        input_embeds = merge_embeds(params, input_ids, mm_buffer,
                                    mm_rows)
    return llama.forward(params, cfg, input_ids, positions, kv_caches,
                         meta, q_blk=q_blk, input_embeds=input_embeds,
                         **kw)


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    params = llama.random_params(cfg, seed)
    v = cfg.vision
    Ev, I_v, L = v["hidden_size"], v["intermediate_size"], v["num_layers"]
    P = v["patch_size"]
    N = (v["image_size"] // P)**2
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed + 7)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    def ln(n):
        return {"scale": jnp.ones((n, ), dtype),
                "bias": jnp.zeros((n, ), dtype)}

    def dense(i, o):
        return {"weight": w((i, o)), "bias": jnp.zeros((o, ), dtype)}

    layers = [{
        "layer_norm1": ln(Ev),
        "layer_norm2": ln(Ev),
        "q_proj": dense(Ev, Ev),
        "k_proj": dense(Ev, Ev),
        "v_proj": dense(Ev, Ev),
        "out_proj": dense(Ev, Ev),
        "fc1": dense(Ev, I_v),
        "fc2": dense(I_v, Ev),
    } for _ in range(L)]
    params["vision_tower"] = {
        "class_embedding": w((Ev, )),
        "patch_embedding": {"weight": w((3 * P * P, Ev))},
        "position_embedding": w((1 + N, Ev)),
        "pre_layernorm": ln(Ev),
        "layers": layers,
    }
    params["projector"] = {
        "linear_1": dense(Ev, cfg.hidden_size),
        "linear_2": dense(cfg.hidden_size, cfg.hidden_size),
    }
    return params
