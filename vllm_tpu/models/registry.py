"""Architecture -> model module registry.

Ref analog: vllm/model_executor/models/registry.py (lazy import map).
A "model" here is a module exposing ``forward(params, cfg, ...)``,
``compute_logits``, and ``random_params`` over a param pytree.
"""

from __future__ import annotations

import importlib

_REGISTRY: dict[str, str] = {
    "LlamaForCausalLM": "vllm_tpu.models.llama",
    "Qwen2ForCausalLM": "vllm_tpu.models.llama",
    "MistralForCausalLM": "vllm_tpu.models.llama",
    "Phi3ForCausalLM": "vllm_tpu.models.llama",  # fused proj + longrope
    "Glm4ForCausalLM": "vllm_tpu.models.glm4",
    "GlmForCausalLM": "vllm_tpu.models.glm4",
    "CohereForCausalLM": "vllm_tpu.models.cohere",
    "Cohere2ForCausalLM": "vllm_tpu.models.cohere",
    "TinyLlamaForCausalLM": "vllm_tpu.models.llama",
    "Qwen3ForCausalLM": "vllm_tpu.models.llama",  # + per-head qk-norm
    "MixtralForCausalLM": "vllm_tpu.models.mixtral",
    "DeepseekV2ForCausalLM": "vllm_tpu.models.deepseek",  # MLA + MoE
    "DeepseekV3ForCausalLM": "vllm_tpu.models.deepseek",
    "DeepseekV32ForCausalLM": "vllm_tpu.models.deepseek",
    "BertModel": "vllm_tpu.models.bert",  # encoder-only embedder
    "RobertaModel": "vllm_tpu.models.bert",  # + position offset
    "XLMRobertaModel": "vllm_tpu.models.bert",
    "BertForSequenceClassification": "vllm_tpu.models.bert",
    "RobertaForSequenceClassification": "vllm_tpu.models.bert",
    "XLMRobertaForSequenceClassification": "vllm_tpu.models.bert",
    "WhisperForConditionalGeneration": "vllm_tpu.models.whisper",  # STT
    "Qwen3NextForCausalLM": "vllm_tpu.models.qwen3_next",  # GDN hybrid
    "MambaForCausalLM": "vllm_tpu.models.mamba1",  # v1 selective scan
    "Mamba2ForCausalLM": "vllm_tpu.models.mamba2",  # pure SSM
    "BambaForCausalLM": "vllm_tpu.models.bamba",  # hybrid SSM+attn
    "LlavaForConditionalGeneration": "vllm_tpu.models.llava",  # VLM
    "Qwen2MoeForCausalLM": "vllm_tpu.models.qwen2_moe",
    "Qwen3MoeForCausalLM": "vllm_tpu.models.qwen2_moe",
    "Qwen2VLForConditionalGeneration": "vllm_tpu.models.qwen2_vl",
    "GemmaForCausalLM": "vllm_tpu.models.gemma",
    "Gemma2ForCausalLM": "vllm_tpu.models.gemma",
    "Gemma3ForCausalLM": "vllm_tpu.models.gemma",
    "GptOssForCausalLM": "vllm_tpu.models.gpt_oss",
}


def register_model(architecture: str, module_path: str) -> None:
    """Out-of-tree model registration (ref analog: ModelRegistry
    OOT hooks)."""
    _REGISTRY[architecture] = module_path


def get_model(architecture: str):
    if architecture not in _REGISTRY:
        raise ValueError(f"unknown architecture {architecture}; "
                         f"known: {sorted(_REGISTRY)}")
    return importlib.import_module(_REGISTRY[architecture])
