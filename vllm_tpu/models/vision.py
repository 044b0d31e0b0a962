"""CLIP-style vision tower + multimodal projector (functional JAX).

Ref analog: vllm/model_executor/models/clip.py (CLIPVisionModel) and
llava.py's multi_modal_projector. TPU-first: the patch "conv" is a
single MXU matmul over flattened patches; encoder attention is plain
dense MHA (no cache, no causal mask) — XLA fuses the whole image
encode into a few kernels.

Param schema (vision tower):
    class_embedding: [Ev]
    patch_embedding: {"weight": [3*P*P, Ev]}   (flattened conv kernel)
    position_embedding: [1 + N, Ev]
    pre_layernorm: {"scale": [Ev], "bias": [Ev]}
    layers[i]:
      layer_norm1/2: {"scale", "bias"}
      q_proj/k_proj/v_proj/out_proj: {"weight", "bias"}
      fc1/fc2: {"weight", "bias"}
Projector: linear_1/linear_2: {"weight", "bias"}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, p: dict, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu)**2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _dense(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["weight"] + p["bias"]


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """[3, H, W] -> [N, 3*P*P] in (c, dy, dx) order (conv-equivalent)."""
    c, h, w = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(c, gh, patch, gw, patch)
    x = x.transpose(1, 3, 0, 2, 4)  # [gh, gw, c, P, P]
    return x.reshape(gh * gw, c * patch * patch)


def clip_encode(vt: dict, pixels: jax.Array, *, patch: int,
                num_heads: int, feature_layer: int = -2,
                eps: float = 1e-5) -> jax.Array:
    """One image [3, H, W] -> patch features [N, Ev] (CLS dropped,
    hidden states taken at ``feature_layer`` per llava's
    vision_feature_layer / 'default' select strategy)."""
    embeds = patchify(pixels, patch) @ vt["patch_embedding"]["weight"]
    cls = vt["class_embedding"][None, :].astype(embeds.dtype)
    x = jnp.concatenate([cls, embeds], axis=0)
    x = x + vt["position_embedding"][:x.shape[0]]
    x = layer_norm(x, vt["pre_layernorm"], eps)

    L = len(vt["layers"])
    n_run = L + feature_layer + 1 if feature_layer < 0 else feature_layer
    Ev = x.shape[-1]
    D = Ev // num_heads
    for layer in vt["layers"][:n_run]:
        h = layer_norm(x, layer["layer_norm1"], eps)
        q = _dense(layer["q_proj"], h).reshape(-1, num_heads, D)
        k = _dense(layer["k_proj"], h).reshape(-1, num_heads, D)
        v = _dense(layer["v_proj"], h).reshape(-1, num_heads, D)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (D**-0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, Ev)
        x = x + _dense(layer["out_proj"], ctx)
        h = layer_norm(x, layer["layer_norm2"], eps)
        h = quick_gelu(_dense(layer["fc1"], h))
        x = x + _dense(layer["fc2"], h)
    return x[1:]  # drop CLS


def project(proj: dict, feats: jax.Array) -> jax.Array:
    """[N, Ev] -> [N, E] via the llava 2-layer GELU MLP."""
    h = jax.nn.gelu(_dense(proj["linear_1"], feats),
                    approximate=False)
    return _dense(proj["linear_2"], h)
