"""Qwen2-VL: ViT vision tower + mrope (multimodal 3D RoPE) language
model.

Capability parity target: ref vllm/model_executor/models/qwen2_vl.py
(Qwen2VLForConditionalGeneration) + MRotaryEmbedding (vllm
rotary_embedding mrope). Numerics follow HF modeling_qwen2_vl.

Engine contract (matches llava.py): the prompt arrives with the image
token pre-expanded to one token per *merged* patch (grid.prod() /
spatial_merge_size**2 tokens per image); the runner encodes images at
admission and passes (mm_buffer, mm_rows). mrope positions ride in as
``positions3`` [3, T] for ragged steps; decode steps use regular RoPE
at (position + mrope_delta) — equal rows reduce mrope to 1-D RoPE.

Param schema: llama/Qwen2 leaves at top level (llama.forward consumes
them; qkv/o biases supported by ops/linear.py) plus:
    visual:
      patch_embed: {"weight": [C*tp*ps*ps, Ev]}   (flattened Conv3d)
      blocks[i]:
        norm1/norm2: {"scale", "bias"}            (LayerNorm eps 1e-6)
        qkv: {"weight": [Ev, 3*Ev], "bias"}
        proj: {"weight", "bias"}
        fc1/fc2: {"weight", "bias"}
      merger:
        ln_q: {"scale", "bias"}
        mlp_0: {"weight": [4*Ev, 4*Ev], "bias"}
        mlp_2: {"weight": [4*Ev, E], "bias"}
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models import llama
from vllm_tpu.models.llama import compute_logits  # noqa: F401
from vllm_tpu.models.llava import merge_embeds
from vllm_tpu.models.vision import layer_norm, quick_gelu, _dense
from vllm_tpu.ops.layers import mrope_cos_sin
from vllm_tpu.ops.metadata import AttentionMetadata


# -- vision tower -----------------------------------------------------

def _vision_pos_ids(grid: tuple[int, int, int], merge: int) -> np.ndarray:
    """(h, w) patch position ids in spatial-merge-group order — the
    same permutation the HF image processor applies to the patches
    themselves (ref: Qwen2VisionTransformer.rot_pos_emb)."""
    t, h, w = grid
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def perm(p):
        return (p.reshape(h // merge, merge, w // merge,
                          merge).transpose(0, 2, 1, 3).reshape(-1))

    pos = np.stack([perm(hpos), perm(wpos)], axis=-1)  # [h*w, 2]
    return np.tile(pos, (t, 1))


def _vision_cos_sin(grid, merge: int, head_dim: int, dtype):
    """Half-dim rope tables [S, head_dim/2]: h-freqs then w-freqs
    (VisionRotaryEmbedding(head_dim//2) over (h, w) pos ids)."""
    pos = _vision_pos_ids(grid, merge)  # [S, 2]
    dim = head_dim // 2
    inv_freq = 1.0 / (10000.0**(np.arange(0, dim, 2, dtype=np.float32) /
                                dim))
    freqs = pos[:, :, None].astype(np.float32) * inv_freq[None, None, :]
    # HF concatenates h-freqs then w-freqs along the channel dim.
    emb = np.concatenate([freqs[:, 0], freqs[:, 1]], axis=-1)
    return (jnp.asarray(np.cos(emb), dtype),
            jnp.asarray(np.sin(emb), dtype))


def _rotate_half_apply(x, cos, sin):
    """HF NeoX-half rope on [S, heads, d] with cos/sin [S, d/2]."""
    d2 = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :d2], xf[..., d2:]
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s],
                           axis=-1).astype(x.dtype)


def vision_encode(params: dict, cfg: ModelConfig, pixels: jax.Array,
                  grid: tuple[int, int, int]) -> jax.Array:
    """One image's flattened patches [S, C*tp*ps*ps] -> merged patch
    embeddings [S / merge**2, E]. Full (non-causal) attention over all
    S patches of the image; 2-D rope over (h, w)."""
    v = cfg.vision
    vt = params["visual"]
    Ev = v["embed_dim"]
    heads = v["num_heads"]
    hd = Ev // heads
    merge = v.get("spatial_merge_size", 2)
    act = quick_gelu if v.get("hidden_act", "quick_gelu") == "quick_gelu" \
        else jax.nn.gelu
    x = pixels.astype(jnp.float32) @ vt["patch_embed"]["weight"].astype(
        jnp.float32)
    x = x.astype(pixels.dtype)
    cos, sin = _vision_cos_sin(grid, merge, hd, jnp.float32)
    S = x.shape[0]
    for blk in vt["blocks"]:
        h = layer_norm(x, blk["norm1"], 1e-6)
        qkv = _dense(blk["qkv"], h).reshape(S, 3, heads, hd)
        q, k, vv = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _rotate_half_apply(q, cos, sin)
        k = _rotate_half_apply(k, cos, sin)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (hd**-0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        ctx = jnp.einsum("hqk,khd->qhd", probs, vv).reshape(S, Ev)
        x = x + _dense(blk["proj"], ctx)
        h = layer_norm(x, blk["norm2"], 1e-6)
        x = x + _dense(blk["fc2"], act(_dense(blk["fc1"], h)))
    m = vt["merger"]
    h = layer_norm(x, m["ln_q"], 1e-6)
    h = h.reshape(S // (merge * merge), merge * merge * Ev)
    h = jax.nn.gelu(_dense(m["mlp_0"], h), approximate=False)
    return _dense(m["mlp_2"], h)


def encode_images(params: dict, cfg: ModelConfig, pixels,
                  grid_thw) -> jax.Array:
    """Per-image encode (grids vary -> one compile per unique grid).
    pixels: [S_total, C*tp*ps*ps]; grid_thw: [(t, h, w), ...].
    Returns concatenated merged embeddings [sum(S_i/merge^2), E]."""
    fn = _encode_one(cfg)
    outs, off = [], 0
    for g in [tuple(int(x) for x in g) for g in grid_thw]:
        s = g[0] * g[1] * g[2]
        outs.append(fn(params, jnp.asarray(pixels[off:off + s]), g))
        off += s
    return jnp.concatenate(outs, axis=0)


_ENCODE_CACHE: dict[int, object] = {}


def _encode_one(cfg):
    """Per-config jitted single-image encoder (grid static: one
    compile per unique patch grid). Keyed on config identity —
    ModelConfig is mutable, so not lru_cache-able."""
    fn = _ENCODE_CACHE.get(id(cfg))
    if fn is None:
        def run(params, pixels, grid):
            return vision_encode(params, cfg, pixels, grid)
        fn = _ENCODE_CACHE[id(cfg)] = jax.jit(run, static_argnums=(2, ))
    return fn


# -- mrope positions ---------------------------------------------------

def mrope_positions(prompt_token_ids, grid_thws, cfg: ModelConfig
                    ) -> tuple[np.ndarray, int]:
    """(positions3 [3, L], mrope_delta) for one prompt (ref analog:
    Qwen2VLModel.get_rope_index / vllm MRotaryEmbedding
    get_input_positions). Image/video spans arrive pre-expanded to one
    token per merged patch; text positions continue from the max seen
    position + 1 (so they can be *smaller* than the token index —
    delta = max + 1 - L is carried for decode)."""
    toks = np.asarray(prompt_token_ids)
    L = len(toks)
    merge = cfg.vision.get("spatial_merge_size", 2) if cfg.vision else 2
    img_tok = cfg.image_token_index
    vid_tok = getattr(cfg, "video_token_index", -1)
    pos = np.zeros((3, L), np.int64)
    st = 0
    st_idx = 0
    gi = 0
    is_mm = (toks == img_tok) | (toks == vid_tok)
    while st < L:
        if not is_mm[st]:
            ed = st
            while ed < L and not is_mm[ed]:
                ed += 1
            pos[:, st:ed] = np.arange(st_idx, st_idx + ed - st)
            st_idx += ed - st
            st = ed
            continue
        t, h, w = grid_thws[gi]
        gi += 1
        gh, gw = h // merge, w // merge
        n = t * gh * gw
        t_idx = np.repeat(np.arange(t), gh * gw)
        h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
        w_idx = np.tile(np.arange(gw), t * gh)
        pos[0, st:st + n] = t_idx + st_idx
        pos[1, st:st + n] = h_idx + st_idx
        pos[2, st:st + n] = w_idx + st_idx
        st_idx = int(pos[:, st:st + n].max()) + 1
        st += n
    delta = int(pos.max()) + 1 - L if L else 0
    return pos.astype(np.int32), delta


# -- language forward ---------------------------------------------------

def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list[jax.Array],
    meta: AttentionMetadata,
    q_blk: int = 128,
    mm_buffer=None,
    mm_rows=None,
    positions3=None,  # [3, T] mrope rows (ragged/prefill steps)
    **kw,
) -> tuple[jax.Array, list[jax.Array]]:
    input_embeds = None
    if mm_buffer is not None:
        input_embeds = merge_embeds(params, input_ids, mm_buffer,
                                    mm_rows)
    cos_sin = None
    if positions3 is not None:
        cos_sin = mrope_cos_sin(positions3, cfg)
    return llama.forward(params, cfg, input_ids, positions, kv_caches,
                         meta, q_blk=q_blk, input_embeds=input_embeds,
                         cos_sin=cos_sin, **kw)


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    params = llama.random_params(cfg, seed)
    v = cfg.vision
    Ev, L = v["embed_dim"], v["depth"]
    heads = v["num_heads"]
    ps = v["patch_size"]
    tp = v.get("temporal_patch_size", 2)
    merge = v.get("spatial_merge_size", 2)
    mlp_dim = int(Ev * v.get("mlp_ratio", 4))
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed + 11)

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

    blocks = [{
        "norm1": ln(Ev),
        "norm2": ln(Ev),
        "qkv": dense(Ev, 3 * Ev),
        "proj": dense(Ev, Ev),
        "fc1": dense(Ev, mlp_dim),
        "fc2": dense(mlp_dim, Ev),
    } for _ in range(L)]
    params["visual"] = {
        "patch_embed": {"weight": w((3 * tp * ps * ps, Ev))},
        "blocks": blocks,
        "merger": {
            "ln_q": ln(Ev),
            "mlp_0": dense(merge * merge * Ev, merge * merge * Ev),
            "mlp_2": dense(merge * merge * Ev, cfg.hidden_size),
        },
    }
    return params
