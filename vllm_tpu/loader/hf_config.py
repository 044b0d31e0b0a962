"""HF ``config.json`` -> ModelConfig.

Ref analog: vllm/config/model.py deriving from transformers configs.
Reads the json directly (no transformers import needed on this path).
"""

from __future__ import annotations

import json
import os
from typing import Any

from vllm_tpu.config import ModelConfig

SUPPORTED_ARCHS = {
    "LlamaForCausalLM": "llama",
    "Qwen2ForCausalLM": "llama",  # llama + attention_bias
    "MistralForCausalLM": "llama",  # llama + sliding_window
    "Phi3ForCausalLM": "llama",  # fused qkv/gate_up + longrope
    "Glm4ForCausalLM": "glm4",  # sandwich norms + partial ileave rope
    "GlmForCausalLM": "glm4",  # glm-edge family (no sandwich norms)
    "CohereForCausalLM": "cohere",  # command-r: parallel block + LN
    "Cohere2ForCausalLM": "cohere",  # + interleaved sliding windows
    "TinyLlamaForCausalLM": "llama",
    "Qwen3ForCausalLM": "llama",  # + qk-norm (handled in model)
    "MixtralForCausalLM": "mixtral",
    "DeepseekV2ForCausalLM": "deepseek",  # MLA + grouped-routing MoE
    "DeepseekV3ForCausalLM": "deepseek",
    "DeepseekV32ForCausalLM": "deepseek",  # + DSA sparse attention
    "BertModel": "bert",  # encoder-only embedder (/v1/embeddings)
    "RobertaModel": "bert",  # roberta-class (pad-offset positions)
    "XLMRobertaModel": "bert",
    # cross-encoder / classifier heads (/score /rerank /classify —
    # ref: entrypoints/pooling/scoring):
    "BertForSequenceClassification": "bert",
    "RobertaForSequenceClassification": "bert",
    "XLMRobertaForSequenceClassification": "bert",
    "WhisperForConditionalGeneration": "whisper",  # speech-to-text
    "Qwen3NextForCausalLM": "qwen3_next",  # GDN + gated-attn MoE hybrid
    "MambaForCausalLM": "mamba1",  # v1 selective scan (state caches)
    "Mamba2ForCausalLM": "mamba2",  # pure SSM (state caches)
    "BambaForCausalLM": "bamba",  # hybrid SSM + attention
    "LlavaForConditionalGeneration": "llava",  # VLM
    "Qwen2MoeForCausalLM": "qwen2_moe",  # MoE + shared expert
    "Qwen3MoeForCausalLM": "qwen2_moe",
    "Qwen2VLForConditionalGeneration": "qwen2_vl",  # VLM + mrope
    "GemmaForCausalLM": "gemma",  # GeGLU + (1+w) norms + tied embeds
    "Gemma2ForCausalLM": "gemma",  # + sandwich norms, softcaps, SWA
    "Gemma3ForCausalLM": "gemma",  # + qk-norm, dual rope
    "GptOssForCausalLM": "gpt_oss",  # MoE + sinks + interleaved SWA
}

_ENCODER_ARCHS = (
    "BertModel", "RobertaModel", "XLMRobertaModel",
    "BertForSequenceClassification", "RobertaForSequenceClassification",
    "XLMRobertaForSequenceClassification")

# Fallback when config.json lacks "architectures" (model_type -> arch).
_MODEL_TYPE_ARCHS = {
    "qwen2_vl": "Qwen2VLForConditionalGeneration",
    "llava": "LlavaForConditionalGeneration",
    "mixtral": "MixtralForCausalLM",
    "qwen2_moe": "Qwen2MoeForCausalLM",
    "qwen3_moe": "Qwen3MoeForCausalLM",
    "bert": "BertModel",
    "roberta": "RobertaModel",
    "xlm-roberta": "XLMRobertaModel",
    "whisper": "WhisperForConditionalGeneration",
    "qwen3_next": "Qwen3NextForCausalLM",
    "mamba": "MambaForCausalLM",
    "mamba2": "Mamba2ForCausalLM",
    "bamba": "BambaForCausalLM",
    "deepseek_v2": "DeepseekV2ForCausalLM",
    "deepseek_v3": "DeepseekV3ForCausalLM",
    "deepseek_v32": "DeepseekV32ForCausalLM",
    "phi3": "Phi3ForCausalLM",
    "glm4": "Glm4ForCausalLM",
    "glm": "GlmForCausalLM",
    "cohere": "CohereForCausalLM",
    "cohere2": "Cohere2ForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "gemma3_text": "Gemma3ForCausalLM",
    "gpt_oss": "GptOssForCausalLM",
}


def load_hf_config_dict(model_path: str) -> dict[str, Any]:
    path = os.path.join(model_path, "config.json")
    with open(path) as f:
        return json.load(f)


def model_config_from_hf(
    model_path: str,
    max_model_len: int | None = None,
    dtype: str = "bfloat16",
) -> ModelConfig:
    if str(model_path).endswith(".gguf"):
        # Self-describing llama.cpp checkpoint (loader/gguf_loader.py).
        from vllm_tpu.loader.gguf_loader import model_config_from_gguf
        return model_config_from_gguf(model_path,
                                      max_model_len=max_model_len,
                                      dtype=dtype)
    hf = load_hf_config_dict(model_path)
    arch = (hf.get("architectures") or [None])[0]
    if arch is None:  # some save paths omit architectures
        arch = _MODEL_TYPE_ARCHS.get(hf.get("model_type"),
                                     "LlamaForCausalLM")
    if arch not in SUPPORTED_ARCHS:
        raise ValueError(
            f"unsupported architecture {arch}; supported: "
            f"{sorted(SUPPORTED_ARCHS)}")
    if arch == "WhisperForConditionalGeneration":
        cfg = ModelConfig(
            model=model_path,
            architecture=arch,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["d_model"],
            intermediate_size=hf.get("decoder_ffn_dim",
                                     4 * hf["d_model"]),
            num_layers=hf["decoder_layers"],
            num_heads=hf["decoder_attention_heads"],
            num_kv_heads=hf["decoder_attention_heads"],
            head_dim=hf["d_model"] // hf["decoder_attention_heads"],
            max_model_len=min(max_model_len or 10**9,
                              hf.get("max_target_positions", 448)),
            dtype=dtype,
            tie_word_embeddings=True,
            audio={
                "num_mel_bins": hf.get("num_mel_bins", 80),
                "encoder_layers": hf["encoder_layers"],
                "encoder_attention_heads": hf["encoder_attention_heads"],
                "encoder_ffn_dim": hf.get("encoder_ffn_dim",
                                          4 * hf["d_model"]),
                "max_source_positions": hf.get("max_source_positions",
                                               1500),
            },
            hf_config=hf,
        )
        eos = hf.get("eos_token_id")
        cfg.eos_token_ids = (  # type: ignore[attr-defined]
            [eos] if isinstance(eos, int) else list(eos or []))
        return cfg
    if arch in _ENCODER_ARCHS:
        # Roberta-class positions are offset by pad_token_id + 1
        # (create_position_ids_from_input_ids); the offset also
        # shrinks the usable context below max_position_embeddings.
        pos_off = (hf.get("pad_token_id", 1) + 1
                   if not arch.startswith("Bert") else 0)
        cfg = ModelConfig(
            model=model_path,
            architecture=arch,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf["num_attention_heads"],
            head_dim=hf["hidden_size"] // hf["num_attention_heads"],
            rms_norm_eps=hf.get("layer_norm_eps", 1e-12),
            max_model_len=min(max_model_len or 10**9,
                              hf.get("max_position_embeddings", 512)
                              - pos_off),
            dtype=dtype,
            hf_config=hf,
        )
        return cfg
    if arch == "MambaForCausalLM":
        d_inner = hf.get("intermediate_size") or (
            hf.get("expand", 2) * hf["hidden_size"])
        dt_rank = hf.get("time_step_rank", "auto")
        if dt_rank in (None, "auto"):
            dt_rank = -(-hf["hidden_size"] // 16)  # ceil(E/16)
        cfg = ModelConfig(
            model=model_path,
            architecture=arch,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=d_inner,
            num_layers=hf["num_hidden_layers"],
            num_heads=1,
            num_kv_heads=1,
            head_dim=64,
            rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            max_model_len=max_model_len or 2048,
            dtype=dtype,
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            mamba_d_state=hf.get("state_size", 16),
            mamba_d_conv=hf.get("conv_kernel", 4),
            mamba_num_heads=1,  # gates the shared SSM engine paths
            mamba_d_inner=d_inner,
            mamba_dt_rank=int(dt_rank),
            hf_config=hf,
        )
        eos = hf.get("eos_token_id")
        cfg.eos_token_ids = (  # type: ignore[attr-defined]
            [eos] if isinstance(eos, int) else list(eos or []))
        return cfg
    if arch == "Mamba2ForCausalLM":
        d_inner = hf.get("expand", 2) * hf["hidden_size"]
        cfg = ModelConfig(
            model=model_path,
            architecture=arch,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=d_inner,
            num_layers=hf["num_hidden_layers"],
            num_heads=1,
            num_kv_heads=1,
            head_dim=hf.get("head_dim", 64),
            rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            max_model_len=max_model_len or 2048,
            dtype=dtype,
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            mamba_d_state=hf.get("state_size", 128),
            mamba_d_conv=hf.get("conv_kernel", 4),
            mamba_n_groups=hf.get("n_groups", 1),
            mamba_num_heads=hf["num_heads"],
            mamba_d_inner=d_inner,
            mamba_time_step_limit=tuple(
                hf.get("time_step_limit") or (0.0, float("inf"))),
            hf_config=hf,
        )
        eos = hf.get("eos_token_id")
        cfg.eos_token_ids = (  # type: ignore[attr-defined]
            eos if isinstance(eos, list) else
            [eos] if eos is not None else [])
        return cfg

    vision = None
    image_token_index = -1
    video_token_index = -1
    if arch == "LlavaForConditionalGeneration":
        vc = hf["vision_config"]
        vision = {
            "hidden_size": vc["hidden_size"],
            "intermediate_size": vc["intermediate_size"],
            "num_layers": vc["num_hidden_layers"],
            "num_heads": vc["num_attention_heads"],
            "image_size": vc["image_size"],
            "patch_size": vc["patch_size"],
            "feature_layer": hf.get("vision_feature_layer", -2),
            "layer_norm_eps": vc.get("layer_norm_eps", 1e-5),
        }
        image_token_index = hf.get("image_token_index", 32000)
        hf = dict(hf, **hf["text_config"])  # language dims from text
    elif arch == "Qwen2VLForConditionalGeneration":
        vc = hf["vision_config"]
        vision = {
            "embed_dim": vc.get("embed_dim", vc.get("hidden_size")),
            "depth": vc["depth"],
            "num_heads": vc.get("num_heads", 16),
            "patch_size": vc.get("patch_size", 14),
            "temporal_patch_size": vc.get("temporal_patch_size", 2),
            "spatial_merge_size": vc.get("spatial_merge_size", 2),
            "mlp_ratio": vc.get("mlp_ratio", 4),
            "hidden_act": vc.get("hidden_act", "quick_gelu"),
            "in_channels": vc.get("in_channels", vc.get("in_chans", 3)),
        }
        image_token_index = hf.get("image_token_id", 151655)
        video_token_index = hf.get("video_token_id", 151656)
        if "text_config" in hf:
            hf = dict(hf, **hf["text_config"])

    num_heads = hf["num_attention_heads"]
    max_pos = hf.get("max_position_embeddings", 2048)
    cfg = ModelConfig(
        num_experts=hf.get("num_local_experts", hf.get("num_experts", 0)),
        num_experts_per_tok=hf.get("num_experts_per_tok", 0),
        moe_intermediate_size=hf.get("moe_intermediate_size"),
        model=model_path,
        architecture=arch,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=hf.get("num_key_value_heads", num_heads),
        head_dim=hf.get("head_dim"),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=hf.get("rope_scaling"),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        max_model_len=min(max_model_len or max_pos, max_pos),
        dtype=dtype,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        attention_bias=(arch in ("Qwen2ForCausalLM",
                                 "Qwen2MoeForCausalLM",
                                 "Qwen2VLForConditionalGeneration")
                        or hf.get("attention_bias", False)),
        sliding_window=(hf.get("sliding_window")
                        if hf.get("use_sliding_window", True) else None),
        vision=vision,
        image_token_index=image_token_index,
        video_token_index=video_token_index,
        hf_config=hf,
    )
    if arch == "BambaForCausalLM":  # hybrid SSM + attention
        lbt = hf.get("layers_block_type")
        if lbt is None:  # derived field: attn_layer_indices only
            attn = set(hf.get("attn_layer_indices") or [])
            lbt = [
                "attention" if i in attn else "mamba"
                for i in range(hf["num_hidden_layers"])
            ]
        cfg.layer_types = tuple(lbt)
        cfg.partial_rotary_factor = hf.get("partial_rotary_factor", 0.5)
        cfg.mamba_num_heads = hf["mamba_n_heads"]
        cfg.mamba_d_inner = hf.get("mamba_expand", 2) * hf["hidden_size"]
        cfg.mamba_d_state = hf.get("mamba_d_state", 128)
        cfg.mamba_d_conv = hf.get("mamba_d_conv", 4)
        cfg.mamba_n_groups = hf.get("mamba_n_groups", 1)
    if arch in ("Qwen2MoeForCausalLM", "Qwen3MoeForCausalLM"):
        cfg.norm_topk_prob = hf.get("norm_topk_prob", False)
    if arch in ("Glm4ForCausalLM", "GlmForCausalLM"):
        cfg.partial_rotary_factor = hf.get("partial_rotary_factor", 0.5)
    if arch in ("CohereForCausalLM", "Cohere2ForCausalLM"):
        # LayerNorm eps rides the rms field; logit_scale + qk-norm and
        # per-layer sliding pattern come from hf_config at runtime.
        cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-5)
        cfg.tie_word_embeddings = True  # command-r always ties
        if arch == "Cohere2ForCausalLM" and hf.get("sliding_window"):
            lt = hf.get("layer_types")
            if lt:
                cfg.layer_types = tuple(lt)
            else:
                pat = int(hf.get("sliding_window_pattern", 4))
                cfg.layer_types = tuple(
                    "full_attention" if (i + 1) % pat == 0
                    else "sliding_attention"
                    for i in range(hf["num_hidden_layers"]))
            cfg.interleaved_sliding_window = hf["sliding_window"]
            cfg.sliding_window = None
    if arch == "Qwen3NextForCausalLM":  # GDN hybrid
        cfg.norm_topk_prob = hf.get("norm_topk_prob", True)
        cfg.layer_types = tuple(hf["layer_types"])
        cfg.partial_rotary_factor = hf.get("partial_rotary_factor",
                                           0.25)
        cfg.intermediate_size = hf.get(
            "shared_expert_intermediate_size", hf["intermediate_size"])
        cfg.gdn = {
            "num_v_heads": hf["linear_num_value_heads"],
            "num_k_heads": hf["linear_num_key_heads"],
            "head_k_dim": hf["linear_key_head_dim"],
            "head_v_dim": hf["linear_value_head_dim"],
            "conv_kernel": hf["linear_conv_kernel_dim"],
        }
    if arch == "GptOssForCausalLM":
        cfg.attention_bias = True
        # Interleaved sliding windows, gemma2-style handling (the KV
        # manager keeps all blocks; models/gpt_oss.py masks per layer).
        cfg.sliding_window = None
        if hf.get("layer_types") and hf.get("sliding_window"):
            cfg.layer_types = tuple(hf["layer_types"])
            cfg.interleaved_sliding_window = hf["sliding_window"]
    if arch in ("GemmaForCausalLM", "Gemma2ForCausalLM",
                "Gemma3ForCausalLM"):
        cfg.hidden_activation = "gelu_tanh"
        cfg.rmsnorm_unit_offset = True
        cfg.scale_embeddings = True
        cfg.tie_word_embeddings = True
        cfg.query_pre_attn_scalar = hf.get("query_pre_attn_scalar")
        cfg.attn_logit_softcap = hf.get("attn_logit_softcapping")
        cfg.logit_softcap = hf.get("final_logit_softcapping")
        cfg.rope_local_base_freq = hf.get("rope_local_base_freq")
        # Interleaved sliding windows: the per-layer map lives in
        # layer_types; the model-level sliding_window stays None so
        # the KV manager never frees blocks full-attention layers
        # still need (models/gemma.py _layer_sliding).
        cfg.sliding_window = None
        if hf.get("layer_types") and hf.get("sliding_window"):
            cfg.layer_types = tuple(hf["layer_types"])
            cfg.interleaved_sliding_window = hf["sliding_window"]
    if hf.get("kv_lora_rank"):  # MLA (DeepSeek-V2/V3)
        cfg.q_lora_rank = hf.get("q_lora_rank")
        cfg.kv_lora_rank = hf["kv_lora_rank"]
        cfg.qk_nope_head_dim = hf["qk_nope_head_dim"]
        cfg.qk_rope_head_dim = hf["qk_rope_head_dim"]
        cfg.v_head_dim = hf["v_head_dim"]
        # Paged-cache geometry: the MLA cache is MQA over the latent
        # vector (see models/deepseek.py).
        cfg.num_kv_heads = 1
        cfg.head_dim = cfg.kv_lora_rank + cfg.qk_rope_head_dim
        cfg.num_experts = hf.get("n_routed_experts", 0) or 0
        cfg.num_shared_experts = hf.get("n_shared_experts", 0) or 0
        cfg.first_k_dense_replace = hf.get("first_k_dense_replace", 0)
        cfg.topk_method = hf.get(
            "topk_method",
            "noaux_tc" if arch in ("DeepseekV3ForCausalLM",
                                   "DeepseekV32ForCausalLM")
            else "greedy")
        if hf.get("index_topk"):  # DeepSeek-V3.2 lightning indexer
            cfg.sparse_index = {
                "n_heads": hf.get("index_n_heads", 64),
                "head_dim": hf.get("index_head_dim", 128),
                "topk": hf["index_topk"],
            }
        cfg.n_group = hf.get("n_group", 1) or 1
        cfg.topk_group = hf.get("topk_group", 1) or 1
        cfg.routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
        cfg.norm_topk_prob = hf.get("norm_topk_prob", False)
    # Surface EOS for the scheduler's stop check.
    eos = hf.get("eos_token_id")
    if eos is not None:
        cfg.eos_token_ids = eos if isinstance(eos, list) else [eos]  # type: ignore[attr-defined]
    else:
        cfg.eos_token_ids = []  # type: ignore[attr-defined]
    return cfg
