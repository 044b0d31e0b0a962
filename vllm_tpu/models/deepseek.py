"""DeepSeek-V2/V3 family: MLA attention + grouped-routing MoE.

Capability parity target: ref vllm/model_executor/models/deepseek_v2.py
(DeepseekV2ForCausalLM, DeepseekV2MoE) and the MLA backend family
(ref: vllm/v1/attention/backends/mla/ — 21 backends collapse into one
TPU formulation here).

TPU-native MLA design — the *absorbed MQA* form everywhere:

The KV cache stores only the latent vector per token:
    k_vec = [c_kv (kv_lora_rank), k_pe (qk_rope_head_dim)]   (KH = 1)
    v_vec = [c_kv, 0-pad]
and queries are pre-absorbed through the kv_b up-projection:
    q_eff[h] = [q_nope[h] @ W_kc[h], q_pe[h]]
so attention is plain MQA with head_dim = kv_lora_rank +
qk_rope_head_dim (e.g. 576) against the existing paged kernels; the
context is up-projected back through W_vc after attention. This is
mathematically identical to the decompressed MHA form (score:
q_nope·(c_kv W_kc) = (q_nope W_kc)·c_kv) and shrinks KV memory ~an
order of magnitude vs MHA — the whole point of MLA.

Param schema extends llama.py per layer:
    q_proj {weight}                  (q_lora_rank is None)
      — or q_a_proj {weight}, q_a_layernorm [r_q], q_b_proj {weight}
    kv_a_proj_with_mqa {weight [E, c+dr]}
    kv_a_layernorm [c]
    kv_b_proj {weight [c, H*(dn+dv)]}
    o_proj {weight [H*dv, E]}
    gate_up_proj/down_proj           (dense layers AND shared experts)
    router {weight [E_h, E], e_score_correction_bias? [E]}  (MoE)
    w_gate_up [E, H, 2I] / w_down [E, I, H]                 (MoE)

Routing (ref: HF DeepseekV2MoEGate / DeepseekV3TopkRouter semantics):
    greedy                — softmax top-k (V2-Lite)
    group_limited_greedy  — softmax, top groups by max score (V2)
    noaux_tc              — sigmoid + e_score_correction_bias, top
                            groups by sum of top-2 (V3)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import _mlp, compute_logits  # noqa: F401
from vllm_tpu.ops.dispatch import (fused_decode_attention,
                                   ragged_paged_attention, write_kv)
from vllm_tpu.ops.kv_cache import write_kv_xla
from vllm_tpu.ops.layers import (apply_rope_interleaved, rms_norm,
                                 rope_cos_sin_dim, silu_and_mul)
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.metadata import AttentionMetadata
from vllm_tpu.ops.moe import apply_experts


def _dequant_dense(leaf: dict, dtype) -> jax.Array:
    if "qweight" in leaf:
        from vllm_tpu.quant.kernels import dequant_weight_xla
        return dequant_weight_xla(leaf, dtype)
    return leaf["weight"]


def mla_attention(
    cfg: ModelConfig,
    layer: dict,
    x: jax.Array,  # [T, E]
    cos: jax.Array,  # [T, dr/2]
    sin: jax.Array,
    kv_cache: jax.Array,
    meta: AttentionMetadata,
    q_blk: int,
) -> tuple[jax.Array, jax.Array]:
    T = x.shape[0]
    H = cfg.num_heads
    c = cfg.kv_lora_rank
    dr = cfg.qk_rope_head_dim
    dn = cfg.qk_nope_head_dim
    dv = cfg.v_head_dim
    D = c + dr
    eps = cfg.rms_norm_eps

    if "q_proj" in layer:
        q = linear(layer["q_proj"], x)
    else:
        q_c = rms_norm(linear(layer["q_a_proj"], x),
                       layer["q_a_layernorm"], eps)
        q = linear(layer["q_b_proj"], q_c)
    q = q.reshape(T, H, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    kv_a = linear(layer["kv_a_proj_with_mqa"], x)  # [T, c+dr]
    c_kv = rms_norm(kv_a[:, :c], layer["kv_a_layernorm"], eps)
    k_pe = kv_a[:, c:]

    q_pe = apply_rope_interleaved(q_pe, cos, sin)
    k_pe = apply_rope_interleaved(k_pe, cos, sin)

    # Absorb the k-nope up-projection into the query (score identity:
    # (q_nope W_kc) · c_kv == q_nope · (c_kv W_kc)).
    wkv = _dequant_dense(layer["kv_b_proj"], x.dtype)
    wkv = wkv.reshape(c, H, dn + dv)
    w_kc, w_vc = wkv[..., :dn], wkv[..., dn:]  # [c, H, dn], [c, H, dv]
    q_eff = jnp.concatenate(
        [jnp.einsum("thd,chd->thc", q_nope, w_kc), q_pe], axis=-1)

    k_vec = jnp.concatenate([c_kv, k_pe], axis=-1)[:, None, :]  # [T,1,D]
    v_vec = jnp.pad(c_kv, ((0, 0), (0, dr)))[:, None, :]
    sm_scale = float((dn + dr)**-0.5)

    if cfg.sparse_index is not None and "indexer" in layer:
        # DSA path: write latent + indexer-K rows, select top-k per
        # query, attend over the selection only.
        latent, index_cache = kv_cache
        if "q_a_proj" in layer:
            q_c_idx = q_c
        else:  # indexer requires the q_lora bottleneck (ref asserts)
            raise NotImplementedError("DSA requires q_lora_rank")
        k_i, qi_pack = _indexer_scores(cfg, layer, x, q_c_idx, cos, sin)
        latent = write_kv_xla(latent, k_vec, v_vec, meta.slot_mapping)
        di = index_cache.shape[-1]
        index_cache = index_cache.reshape(-1, di).at[
            meta.slot_mapping].set(k_i.astype(index_cache.dtype)
                                   ).reshape(index_cache.shape)
        if q_blk == 1:
            ctx_c = _sparse_mla_decode(cfg, q_eff, qi_pack, latent,
                                       index_cache, meta, sm_scale)
        else:
            ctx_c = _sparse_mla_prefill(cfg, q_eff, qi_pack, latent,
                                        index_cache, meta, sm_scale)
        attn = jnp.einsum("thc,chv->thv", ctx_c, w_vc)
        return (linear(layer["o_proj"], attn.reshape(T, H * dv)),
                (latent, index_cache))

    if q_blk == 1:
        ctx, kv_cache = fused_decode_attention(
            q_eff, k_vec, v_vec, kv_cache, meta.block_tables,
            meta.seq_lens, sm_scale=sm_scale)
    else:
        # dispatch.write_kv: under context parallelism each rank
        # scatters only its owned latent slots (the MLA latent cache
        # is an ordinary paged cache with KH=1, so the whole cp
        # machinery applies unchanged).
        kv_cache = write_kv(kv_cache, k_vec, v_vec, meta.slot_mapping)
        ctx = ragged_paged_attention(q_eff, kv_cache, meta.block_tables,
                                     meta.query_start_loc, meta.seq_lens,
                                     sm_scale=sm_scale, q_blk=q_blk)
    # ctx [T, H, D]: value payload is the first c dims; up-project.
    attn = jnp.einsum("thc,chv->thv", ctx[..., :c], w_vc)
    return linear(layer["o_proj"], attn.reshape(T, H * dv)), kv_cache


# -- DeepSeek-V3.2 sparse attention (DSA) -------------------------------
#
# Ref: vllm/models/deepseek_v32/attention.py (DeepseekV32Indexer:38 —
# lightning indexer: per-token top-k selection over the context) +
# model_executor/layers/sparse_attn_indexer.py and the sparse MLA
# backends (v1/attention/backends/mla/flashattn_mla_sparse.py).
#
# TPU formulation: the indexer score is the DSA paper's
#     I[t, s] = sum_h w[t, h] * relu(q_i[t, h] . k_i[s])
# computed in bf16/f32 (the reference quantizes q/k to fp8 for its
# CUDA kernel; the math is the same with q_scale folded away). Each
# layer carries a second paged cache holding the indexer K rows under
# the SAME block tables/slot mapping as the latent cache, and decode
# gathers only the selected top-k latent rows — the long-context win:
# topk * (d_i + D) bytes per query instead of ctx * D. Prefill applies
# the selection as a mask over the dense score matrix (same FLOPs as
# dense at prefill; the sparse payoff is decode-side).


def _gather_paged(cache: jax.Array, block_tables: jax.Array,
                  idx: jax.Array) -> jax.Array:
    """cache [B, bs, D], idx [R, K] token positions -> [R, K, D]
    (rows gathered through each request's block table)."""
    bs = cache.shape[1]
    bids = jnp.take_along_axis(block_tables, idx // bs, axis=1)  # [R,K]
    flat = cache.reshape(-1, cache.shape[-1])
    return flat[bids * bs + idx % bs]


def _indexer_scores(cfg: ModelConfig, layer: dict, x: jax.Array,
                    q_c: jax.Array, cos: jax.Array,
                    sin: jax.Array) -> tuple[jax.Array, jax.Array]:
    """-> (k_rows [T, d_i] to cache, per-query (q_i [T, Hi, d_i],
    w [T, Hi]) packed as a tuple). Scores against any key set are then
    sum_h w * relu(q_i . k)."""
    si = cfg.sparse_index
    Hi, di = si["n_heads"], si["head_dim"]
    dr = cfg.qk_rope_head_dim
    idx = layer["indexer"]
    T = x.shape[0]
    q = linear(idx["wq_b"], q_c).reshape(T, Hi, di)
    q_pe, q_nope = q[..., :dr], q[..., dr:]
    kw = linear(idx["wk_weights_proj"], x)  # [T, di + Hi]
    k = kw[:, :di]
    wts = kw[:, di:]
    # ref k_norm is a biased LayerNorm (eps 1e-6)
    kf = k.astype(jnp.float32)
    mu = kf.mean(-1, keepdims=True)
    var = kf.var(-1, keepdims=True)
    k = ((kf - mu) * jax.lax.rsqrt(var + 1e-6) *
         idx["k_norm"]["weight"].astype(jnp.float32) +
         idx["k_norm"]["bias"].astype(jnp.float32)).astype(x.dtype)
    k_pe, k_nope = k[:, :dr], k[:, dr:]
    q_pe = apply_rope_interleaved(q_pe, cos, sin)
    k_pe = apply_rope_interleaved(k_pe[:, None, :], cos, sin)[:, 0]
    q_i = jnp.concatenate([q_pe, q_nope], axis=-1)
    k_i = jnp.concatenate([k_pe, k_nope], axis=-1)
    w = (wts.astype(jnp.float32) * (di**-0.5) * (Hi**-0.5))
    return k_i, (q_i, w)


def _topk_indices(scores: jax.Array, valid: jax.Array,
                  topk: int) -> tuple[jax.Array, jax.Array]:
    """scores [T, S] f32 + validity mask -> (idx [T, K], sel_valid
    [T, K]). K is static; short contexts pad with invalid slots."""
    masked = jnp.where(valid, scores, -jnp.inf)
    _, idx = jax.lax.top_k(masked, topk)
    sel_valid = jnp.take_along_axis(valid, idx, axis=1)
    return idx.astype(jnp.int32), sel_valid


def _sparse_mla_decode(cfg: ModelConfig, q_eff: jax.Array,
                       qi_pack, latent_cache: jax.Array,
                       index_cache: jax.Array, meta: AttentionMetadata,
                       sm_scale: float) -> jax.Array:
    """Decode rows [R]: score the whole context through the index-K
    cache, select top-k, gather ONLY those latent rows, run absorbed
    MQA over them."""
    si = cfg.sparse_index
    topk = si["topk"]
    q_i, w = qi_pack  # [R, Hi, d_i], [R, Hi]
    R = q_i.shape[0]
    bs = index_cache.shape[1]
    max_blocks = meta.block_tables.shape[1]
    S = max_blocks * bs
    # Dense gather of the index-K prefix (small: d_i bytes/token).
    kI = _gather_paged(index_cache, meta.block_tables,
                       jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32),
                                        (R, S)))  # [R, S, d_i]
    logits = jnp.einsum("rhd,rsd->rhs", q_i.astype(jnp.float32),
                        kI.astype(jnp.float32))
    scores = jnp.einsum("rh,rhs->rs", w, jax.nn.relu(logits))
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = pos < meta.seq_lens[:, None]
    idx, sel_valid = _topk_indices(scores, valid, topk)
    k_sel = _gather_paged(latent_cache[:, 0], meta.block_tables,
                          idx)  # [R, K, Dp]
    D = q_eff.shape[-1]
    s = jnp.einsum("rhd,rkd->rhk", q_eff.astype(jnp.float32),
                   k_sel[..., :D].astype(jnp.float32)) * sm_scale
    s = jnp.where(sel_valid[:, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    c = cfg.kv_lora_rank
    ctx = jnp.einsum("rhk,rkc->rhc", p,
                     k_sel[..., :c].astype(jnp.float32))
    return ctx.astype(q_eff.dtype)  # [R, H, c]


def _sparse_mla_prefill(cfg: ModelConfig, q_eff: jax.Array,
                        qi_pack, latent_cache: jax.Array,
                        index_cache: jax.Array,
                        meta: AttentionMetadata,
                        sm_scale: float) -> jax.Array:
    """Ragged prefill: per query position, select top-k over its
    causal prefix (through the index cache, which already holds this
    chunk's rows) and attend under that mask."""
    si = cfg.sparse_index
    topk = si["topk"]
    q_i, w = qi_pack  # [T, Hi, d_i]
    T = q_i.shape[0]
    bs = index_cache.shape[1]
    nreq = meta.seq_lens.shape[0]
    S = meta.block_tables.shape[1] * bs
    qsl = meta.query_start_loc
    tok = jnp.arange(T, dtype=jnp.int32)
    seg = jnp.searchsorted(qsl, tok, side="right") - 1  # request of tok
    seg = jnp.clip(seg, 0, nreq - 1)  # padding tokens -> last request
    # absolute position of each query token in its request
    qpos = tok - qsl[seg] + (meta.seq_lens[seg] -
                             (qsl[seg + 1] - qsl[seg]))
    kI = _gather_paged(index_cache, meta.block_tables[seg],
                       jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32),
                                        (T, S)))  # [T, S, d_i]
    logits = jnp.einsum("thd,tsd->ths", q_i.astype(jnp.float32),
                        kI.astype(jnp.float32))
    scores = jnp.einsum("th,ths->ts", w, jax.nn.relu(logits))
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    causal = pos <= qpos[:, None]
    idx, sel_valid = _topk_indices(scores, causal, topk)
    # selection mask over the dense score matrix
    sel = jnp.zeros((T, S), bool)
    sel = sel.at[jnp.arange(T)[:, None], idx].set(sel_valid)
    k_all = _gather_paged(latent_cache[:, 0], meta.block_tables[seg],
                          jnp.broadcast_to(
                              jnp.arange(S, dtype=jnp.int32),
                              (T, S)))  # [T, S, Dp]
    D = q_eff.shape[-1]
    s = jnp.einsum("thd,tsd->ths", q_eff.astype(jnp.float32),
                   k_all[..., :D].astype(jnp.float32)) * sm_scale
    s = jnp.where((causal & sel)[:, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    c = cfg.kv_lora_rank
    ctx = jnp.einsum("thk,tkc->thc", p,
                     k_all[..., :c].astype(jnp.float32))
    return ctx.astype(q_eff.dtype)


def _route(cfg: ModelConfig, router: dict, x: jax.Array):
    """Returns (weights [T, K] f32, ids [T, K] i32) per topk_method."""
    logits = jnp.dot(x.astype(jnp.float32),
                     router["weight"].astype(jnp.float32))
    E = logits.shape[-1]
    K = cfg.num_experts_per_tok
    method = cfg.topk_method

    if method == "noaux_tc":  # V3: sigmoid + correction bias
        scores = jax.nn.sigmoid(logits)
        choice = scores + router["e_score_correction_bias"].astype(
            jnp.float32)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores

    if method in ("group_limited_greedy", "noaux_tc") and cfg.n_group > 1:
        G = cfg.n_group
        gsz = E // G
        gview = choice.reshape(-1, G, gsz)
        if method == "noaux_tc":
            group_scores = jax.lax.top_k(gview, 2)[0].sum(-1)  # [T, G]
        else:
            group_scores = gview.max(-1)
        _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)
        gmask = jnp.zeros_like(group_scores).at[
            jnp.arange(gidx.shape[0])[:, None], gidx].set(1.0)
        mask = jnp.repeat(gmask, gsz, axis=-1)
        choice = jnp.where(mask > 0, choice, 0.0)

    _, ids = jax.lax.top_k(choice, K)
    weights = jnp.take_along_axis(scores, ids, axis=-1)
    if cfg.norm_topk_prob:
        weights = weights / (weights.sum(-1, keepdims=True) + 1e-20)
    return weights * cfg.routed_scaling_factor, ids.astype(jnp.int32)


def _moe_ffn(cfg: ModelConfig, layer: dict, x: jax.Array) -> jax.Array:
    weights, ids = _route(cfg, layer["router"], x)
    out = apply_experts(x, weights, ids, layer["w_gate_up"],
                        layer["w_down"], cfg.num_experts_per_tok,
                        eplb=layer.get("eplb"))
    if "gate_up_proj" in layer:  # shared experts (always-on dense MLP)
        out = out + _mlp(layer, x)
    return out


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    positions: jax.Array,
    kv_caches: list[jax.Array],
    meta: AttentionMetadata,
    q_blk: int = 128,
) -> tuple[jax.Array, list[jax.Array]]:
    x = params["embed_tokens"]["weight"][input_ids]
    cos, sin = rope_cos_sin_dim(positions, cfg.qk_rope_head_dim,
                                cfg.rope_theta)
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, kvc = mla_attention(cfg, layer, h, cos, sin,
                                      kv_caches[i], meta, q_blk)
        new_caches.append(kvc)
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"],
                     cfg.rms_norm_eps)
        x = x + (_moe_ffn(cfg, layer, h)
                 if "router" in layer else _mlp(layer, h))
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def make_caches(cfg: ModelConfig, num_blocks: int, block_size: int,
                max_num_reqs: int, cache_cfg, kv_sharding=None) -> list:
    """Per-layer caches: the MLA latent cache, plus (DSA models) the
    indexer-K cache under the same block tables (ref analog:
    DeepseekV32IndexerCache, models/deepseek_v32/attention.py)."""
    from vllm_tpu.ops.kv_cache import make_kv_cache
    caches = []
    for _ in range(cfg.num_layers):
        lat = make_kv_cache(num_blocks, block_size, cfg.num_kv_heads,
                            cfg.head_dim, cache_cfg.cache_dtype,
                            cfg.dtype, sharding=kv_sharding)
        if cfg.sparse_index is None:
            caches.append(lat)
        else:
            di = cfg.sparse_index["head_dim"]
            idx = jnp.zeros((num_blocks, block_size, di),
                            jnp.dtype(cfg.dtype))
            if kv_sharding is not None:
                # Shard the indexer-K block axis over cp exactly like
                # the latent cache (the pool is cp x per-device blocks;
                # the DSA score/gather path is pure XLA under
                # GSPMD-auto, so sharded scatters/gathers partition
                # automatically).
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                data_sh = kv_sharding[0]
                idx = jax.device_put(
                    idx, NamedSharding(data_sh.mesh,
                                       P(data_sh.spec[0], None, None)))
            caches.append((lat, idx))
    return caches


# -- initialization -----------------------------------------------------


def random_params(cfg: ModelConfig, seed: int = 0) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(seed)
    E = cfg.hidden_size
    H = cfg.num_heads
    c, dr, dn, dv = (cfg.kv_lora_rank, cfg.qk_rope_head_dim,
                     cfg.qk_nope_head_dim, cfg.v_head_dim)
    NE = cfg.num_experts
    I_moe = cfg.moe_intermediate_size or cfg.intermediate_size

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def w(shape, scale=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) *
                scale).astype(dtype)

    layers = []
    for i in range(cfg.num_layers):
        layer = {
            "input_layernorm": jnp.ones((E, ), dtype),
            "post_attention_layernorm": jnp.ones((E, ), dtype),
            "kv_a_proj_with_mqa": {"weight": w((E, c + dr))},
            "kv_a_layernorm": jnp.ones((c, ), dtype),
            "kv_b_proj": {"weight": w((c, H * (dn + dv)))},
            "o_proj": {"weight": w((H * dv, E))},
        }
        if cfg.q_lora_rank:
            layer["q_a_proj"] = {"weight": w((E, cfg.q_lora_rank))}
            layer["q_a_layernorm"] = jnp.ones((cfg.q_lora_rank, ), dtype)
            layer["q_b_proj"] = {"weight": w((cfg.q_lora_rank,
                                              H * (dn + dr)))}
        else:
            layer["q_proj"] = {"weight": w((E, H * (dn + dr)))}
        if cfg.sparse_index is not None:
            Hi = cfg.sparse_index["n_heads"]
            di = cfg.sparse_index["head_dim"]
            layer["indexer"] = {
                "wq_b": {"weight": w((cfg.q_lora_rank, Hi * di))},
                "wk_weights_proj": {"weight": w((E, di + Hi))},
                "k_norm": {"weight": jnp.ones((di, ), dtype),
                           "bias": jnp.zeros((di, ), dtype)},
            }
        if NE > 0 and i >= cfg.first_k_dense_replace:
            layer["router"] = {"weight": w((E, NE), scale=0.1)}
            if cfg.topk_method == "noaux_tc":
                layer["router"]["e_score_correction_bias"] = jnp.zeros(
                    (NE, ), jnp.float32)
            layer["w_gate_up"] = w((NE, E, 2 * I_moe))
            layer["w_down"] = w((NE, I_moe, E))
            if cfg.num_shared_experts:
                I_sh = I_moe * cfg.num_shared_experts
                layer["gate_up_proj"] = {"weight": w((E, 2 * I_sh))}
                layer["down_proj"] = {"weight": w((I_sh, E))}
        else:
            layer["gate_up_proj"] = {"weight": w((E,
                                                  2 * cfg.intermediate_size))}
            layer["down_proj"] = {"weight": w((cfg.intermediate_size, E))}
        layers.append(layer)
    params = {
        "embed_tokens": {"weight": w((cfg.vocab_size, E))},
        "layers": layers,
        "norm": jnp.ones((E, ), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": w((E, cfg.vocab_size))}
    return params
