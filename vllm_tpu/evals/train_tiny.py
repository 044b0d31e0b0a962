"""Train a small *non-random* llama-architecture checkpoint in-repo.

Why this exists: the accuracy gate (evals/gate.py) mirrors the
reference's lm-eval CI pins (.buildkite/lm-eval-harness/), but this
environment has zero egress — no real checkpoint can be downloaded.
Random weights produce near-uniform logit distributions whose
quantization error statistics say nothing about real models. This
module trains a tiny byte-level llama on the repository's own source
tree (a real, structured corpus: English prose + Python), producing a
checkpoint whose weight/activation distributions carry actual signal,
so the per-format ppl deltas the gate pins are measurements, not
noise. PARITY.md documents this honestly: it is distilled-scale
evidence, not a 7B-class result.

The trained pytree is exactly ``models/llama.random_params`` structure,
so it drops into the serving stack (and every quant format) unchanged.
The training forward here is a plain dense causal-attention version of
``models/llama.forward`` sharing the ops/layers.py primitives — the
serving forward needs paged-KV metadata that training doesn't have.

Run:  python -m vllm_tpu.evals.train_tiny --steps 3000 \
          --out tests/assets/tiny_distilled.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

# The model config the checkpoint is trained (and must be served) with.
# Dims chosen so every quant format applies: all weight input dims are
# multiples of 256 (W4A16 g128 pack), head_dim 64, byte-level vocab
# padded to 512 (ids = 1 + byte, matching evals/corpus.eval_token_ids'
# tokenizer-free encoding so gate ppl is directly comparable).
def model_config():
    from vllm_tpu.config import ModelConfig
    return ModelConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=4, num_heads=4, num_kv_heads=4, head_dim=64,
        max_model_len=2048, dtype="float32",
        architecture="LlamaForCausalLM")


def repo_corpus(root: str | None = None, max_bytes: int = 4_000_000,
                ) -> bytes:
    """Concatenated .py/.md sources of this repository (deterministic
    order). evals/corpus.py is EXCLUDED: it contains EVAL_TEXT, the
    gate's held-out eval set — training on it would leak."""
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    parts = []
    total = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames
                             if not d.startswith(".")
                             and d not in ("__pycache__", "node_modules"))
        for fn in sorted(filenames):
            if not fn.endswith((".py", ".md")):
                continue
            path = os.path.join(dirpath, fn)
            if path.endswith(os.path.join("evals", "corpus.py")):
                continue
            try:
                data = open(path, "rb").read()
            except OSError:
                continue
            parts.append(data)
            total += len(data)
            if total >= max_bytes:
                return b"\n".join(parts)[:max_bytes]
    return b"\n".join(parts)


def encode(data: bytes) -> np.ndarray:
    """byte -> token id, identical to evals/corpus.eval_token_ids'
    tokenizer-free fallback at vocab 512: id = 1 + byte."""
    return np.frombuffer(data, np.uint8).astype(np.int32) + 1


def train_forward(params: dict, cfg, tokens):
    """Dense causal forward, [B, T] -> [B, T, V] logits. Same math and
    param names as models/llama.forward's prefill path, minus paging."""
    import jax
    import jax.numpy as jnp
    from vllm_tpu.ops.layers import (apply_rope, rms_norm, rope_cos_sin,
                                     silu_and_mul)
    B, T = tokens.shape
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed_tokens"]["weight"][tokens]
    cos, sin = rope_cos_sin(jnp.arange(T), cfg)
    mask = jnp.tril(jnp.ones((T, T), bool))
    scale = D**-0.5
    rope_b = jax.vmap(lambda xi: apply_rope(xi, cos, sin))
    for layer in params["layers"]:
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        qkv = h @ layer["qkv_proj"]["weight"]
        if "bias" in layer["qkv_proj"]:
            qkv = qkv + layer["qkv_proj"]["bias"]
        q, k, v = jnp.split(qkv, [H * D, (H + KH) * D], axis=-1)
        q = rope_b(q.reshape(B, T, H, D))
        k = rope_b(k.reshape(B, T, KH, D))
        v = v.reshape(B, T, KH, D)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        scores = jnp.where(mask[None, None], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * D)
        x = x + o @ layer["o_proj"]["weight"]
        h = rms_norm(x, layer["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        h = silu_and_mul(h @ layer["gate_up_proj"]["weight"])
        x = x + h @ layer["down_proj"]["weight"]
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x @ params["lm_head"]["weight"]


def train(steps: int = 3000, batch: int = 32, seq: int = 256,
          lr: float = 3e-3, seed: int = 0):
    """AdamW next-byte training; returns (params, final train loss)."""
    import jax
    import jax.numpy as jnp
    import optax
    from vllm_tpu.models.llama import random_params

    cfg = model_config()
    ids = encode(repo_corpus())
    n_val = 8192
    train_ids, val_ids = ids[:-n_val], ids[-n_val:]
    logger.info("corpus: %d train / %d val tokens", len(train_ids),
                len(val_ids))
    params = random_params(cfg, seed=seed)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10),
        decay_steps=steps)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(p, toks):
        logits = train_forward(p, cfg, toks[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)
        return nll.mean()

    @jax.jit
    def step(p, o, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def val_loss(p, toks):
        return loss_fn(p, toks)

    rng = np.random.default_rng(seed)
    n_pos = len(train_ids) - seq - 1
    val_batch = np.stack([
        val_ids[i * (seq + 1):(i + 1) * (seq + 1)]
        for i in range(min(16, n_val // (seq + 1)))
    ])
    loss = None
    for it in range(steps):
        starts = rng.integers(0, n_pos, size=batch)
        toks = np.stack([train_ids[s:s + seq + 1] for s in starts])
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(toks))
        if it % 200 == 0 or it == steps - 1:
            vl = float(val_loss(params, jnp.asarray(val_batch)))
            import sys
            print(f"step {it}: train loss {float(loss):.4f}, val loss "
                  f"{vl:.4f} (ppl {np.exp(vl):.2f})", file=sys.stderr,
                  flush=True)
    return params, float(loss)


def save_npz(params: dict, path: str) -> None:
    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(f"{prefix}.{i}", v)
        else:
            flat[prefix] = np.asarray(node, np.float16)

    visit("", params)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> dict:
    """Inverse of save_npz -> the llama params pytree (float32)."""
    data = np.load(path)
    params: dict = {}
    for key, arr in data.items():
        parts = key.split(".")
        node = params
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if p.isdigit():
                p = int(p)
            if isinstance(node, dict):
                node = node.setdefault(
                    p, [] if nxt.isdigit() else {})
            else:  # list
                while len(node) <= p:
                    node.append({})
                node = node[p]
        last = parts[-1]
        tgt = np.asarray(arr, np.float32)
        if isinstance(node, dict):
            node[last] = tgt
        else:
            while len(node) <= int(last):
                node.append(None)
            node[int(last)] = tgt
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="tests/assets/tiny_distilled.npz")
    args = ap.parse_args()
    params, loss = train(args.steps, args.batch, args.seq, args.lr)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_npz(params, args.out)
    logger.info("saved %s (final train loss %.4f)", args.out, loss)


if __name__ == "__main__":
    main()
