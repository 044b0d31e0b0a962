"""Typed configuration tree (composition root: ``EngineConfig``).

TPU-native analog of the reference's config system
(``vllm/config/`` — 33 dataclasses composing ``VllmConfig``,
ref: vllm/config/vllm.py). We keep the same decomposition (model /
cache / scheduler / parallel / quant) but only fields that drive real
behavior here. Every config is a frozen-ish dataclass whose hash keys
the jit/compile cache (ref analog: config-hash keyed torch.compile
artifacts, vllm/compilation/caching.py).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Literal

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

# Dtypes are strings (not jnp dtypes) so configs stay hashable/serializable.
DType = Literal["bfloat16", "float32", "float16"]


@dataclass
class ModelConfig:
    """Architecture hyperparameters.

    Mirrors what the reference derives from a HF ``config.json``
    (ref: vllm/config/model.py); populated either directly (tests) or by
    ``vllm_tpu.loader.hf_config.model_config_from_hf``.
    """

    model: str = ""  # path or HF id (informational)
    architecture: str = "LlamaForCausalLM"
    # Tokenizer backend (engine/tokenizer_registry.py): auto|hf|hf_slow
    # |tiktoken|<OOT-registered> (ref: --tokenizer-mode).
    tokenizer_mode: str = "auto"
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 32
    num_kv_heads: int = 4
    head_dim: int | None = None  # defaults to hidden_size // num_heads
    rope_theta: float = 10000.0
    rope_scaling: dict[str, Any] | None = None
    # Fraction of head_dim that rotates (phi/bamba-style partial rope).
    partial_rotary_factor: float = 1.0
    rms_norm_eps: float = 1e-5
    max_model_len: int = 2048
    dtype: DType = "bfloat16"
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # Qwen2-style qkv bias
    mlp_bias: bool = False
    sliding_window: int | None = None
    # MoE (mixtral/qwen2-moe style); 0 experts == dense MLP.
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int | None = None
    num_shared_experts: int = 0
    # DeepSeek-style MoE routing (ref: deepseek_v2.py DeepseekV2MoEGate)
    first_k_dense_replace: int = 0
    topk_method: str = "greedy"  # greedy | group_limited_greedy | noaux_tc
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    # MLA (DeepSeek-V2/V3; ref: vllm/v1/attention/backends/mla/).
    # kv_lora_rank != None selects the MLA attention path.
    q_lora_rank: int | None = None
    kv_lora_rank: int | None = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # DeepSeek-V3.2 sparse attention (DSA): lightning-indexer geometry
    # {"n_heads", "head_dim", "topk"}; None == dense MLA (ref:
    # vllm/models/deepseek_v32/attention.py DeepseekV32Indexer:38).
    sparse_index: dict[str, Any] | None = None
    # Mamba2/SSD mixer geometry (ref: mamba_mixer2.py; 0 layers = no
    # SSM). For hybrid models, layer_types marks which layers are
    # attention vs mamba.
    mamba_d_state: int = 128
    mamba_d_conv: int = 4
    mamba_n_groups: int = 1
    mamba_num_heads: int = 0  # 0 == model has no mamba layers
    mamba_d_inner: int = 0
    mamba_time_step_limit: tuple[float, float] = (0.0, float("inf"))
    # Mamba1 (selective scan) low-rank dt projection; > 0 marks a v1
    # mixer (A [d_inner, N], x_proj/dt_proj path — ref: mamba_mixer.py
    # time_step_rank).
    mamba_dt_rank: int = 0
    # Gated DeltaNet geometry (Qwen3-Next "linear_attention" layers;
    # ops/gdn.py): num_v_heads / num_k_heads / head_k_dim /
    # head_v_dim / conv_kernel.
    gdn: dict[str, Any] | None = None
    layer_types: tuple[str, ...] | None = None  # hybrid layer map
    # Multimodal (llava-family): vision tower geometry + the token id
    # the processor expands to one-per-patch (ref: llava config).
    vision: dict[str, Any] | None = None
    # Audio encoder geometry (Whisper-class encoder-decoder models):
    # num_mel_bins / encoder_layers / encoder_attention_heads /
    # max_source_positions (models/whisper.py).
    audio: dict[str, Any] | None = None
    image_token_index: int = -1
    video_token_index: int = -1
    # logit softcap (gemma2-style); None == disabled
    logit_softcap: float | None = None
    # Gemma-family knobs (ref: vllm gemma.py / gemma2.py / gemma3.py):
    # attention-score softcap, attention-scale override
    # (query_pre_attn_scalar**-0.5), GeGLU activation, RMSNorm with
    # (1 + weight), sqrt(E)-scaled embeddings, and per-layer
    # interleaved sliding windows (layer_types marks
    # sliding_attention/full_attention; the window below applies to
    # sliding layers only — the KV manager keeps all blocks because
    # full-attention layers still need them).
    attn_logit_softcap: float | None = None
    query_pre_attn_scalar: float | None = None
    hidden_activation: str = "silu"  # silu | gelu_tanh
    rmsnorm_unit_offset: bool = False
    scale_embeddings: bool = False
    interleaved_sliding_window: int | None = None
    # Gemma3: sliding layers use a different rope base.
    rope_local_base_freq: float | None = None
    hf_config: dict[str, Any] = field(default_factory=dict, repr=False)

    def __post_init__(self) -> None:
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_heads
        assert self.num_heads % self.num_kv_heads == 0, (
            "num_heads must be divisible by num_kv_heads")

    @property
    def num_qo_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

# Cache dtype surface mirrors the reference's CacheDType
# (ref: vllm/config/cache.py:19-35): auto/bf16 plus quantized modes.
# tq4/tq3 are TurboQuant codebook modes (ref:
# vllm/v1/attention/backends/turboquant_attn.py): nibble-packed indices
# into a Lloyd-Max N(0,1) codebook over the RHT-rotated basis.
CacheDType = Literal["auto", "bfloat16", "fp8", "fp8_pth", "int8",
                     "int4", "tq4", "tq3"]


@dataclass
class CacheConfig:
    """Paged-KV-cache geometry and quantization.

    ``block_size`` is tokens per KV block (ref default 16; we default to
    a TPU-friendly 32: KV blocks of 32 tokens x 128 head_dim tile
    cleanly into VMEM).
    """

    block_size: int = 32
    num_gpu_blocks: int | None = None  # None => derived from memory
    gpu_memory_utilization: float = 0.9
    cache_dtype: CacheDType = "auto"
    enable_prefix_caching: bool = True
    # Prefix-block hash (ref: vllm/config/cache.py:39
    # PrefixCachingHashAlgo). "fnv" (default since r4) is chained
    # FNV-1a-64 — process-stable (valid FileKVTier / disagg keys,
    # unlike Python's salted builtin) and batch-computed natively
    # (csrc/block_hash.cc); "sha256" for collision-hardened mode.
    prefix_caching_hash_algo: Literal["sha256", "builtin",
                                      "fnv"] = "fnv"
    # Host (CPU RAM) KV tier: evicted cached blocks spill here and
    # re-admit on content-hash hits (0 = off; ref analog:
    # vllm/v1/kv_offload CPU backend / swap_space).
    host_swap_bytes: int = 0
    # Filesystem spill tier below the RAM tier (ref analog:
    # vllm/v1/kv_offload/tiering/ fs backend): RAM-tier evictions
    # demote to one-file-per-block with async write-behind; lookups
    # reach through RAM into disk. Requires host_swap_bytes > 0.
    offload_dir: str | None = None
    offload_dir_bytes: int = 16 * 2**30
    # Shared object-store tier (ref analog: the obj backend under
    # vllm/v1/kv_offload/tiering/ + lmcache-class shared storage):
    # evictions publish to a content-addressed blob service
    # (core/kv_offload.ObjectKVServer) so MULTIPLE engines share
    # prefix KV. Mutually exclusive with offload_dir; requires
    # host_swap_bytes > 0.
    kv_object_store_addr: str | None = None

    @property
    def is_quantized(self) -> bool:
        return self.cache_dtype in ("fp8", "fp8_pth", "int8", "int4",
                                    "tq4", "tq3")


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------


@dataclass
class SchedulerConfig:
    """Continuous-batching knobs.

    Mirrors ref vllm/config/scheduler.py: one token-budget loop, no
    prefill/decode phases (design note ref: vllm/v1/core/sched/
    scheduler.py:442-451); chunked prefill on by default.
    """

    max_num_batched_tokens: int = 2048
    max_num_seqs: int = 64
    enable_chunked_prefill: bool = True
    long_prefill_token_threshold: int = 0  # 0 == no per-req chunk cap
    policy: Literal["fcfs", "priority"] = "fcfs"
    # Multi-step decode: when every scheduled request is a pure decode
    # and nothing is waiting, run up to this many decode iterations in
    # one device program (token feedback on device, one host round trip
    # per horizon). 1 disables. Stop conditions are checked after the
    # horizon, so a request may overrun EOS by up to horizon-1 tokens
    # (discarded). Ref analog: the multi-step/async-scheduling family
    # (vllm step_with_batch_queue, async_scheduling config).
    multi_step_decode_horizon: int = 8
    # Overlap scheduling: schedule (and host-prepare) step N+1 while
    # step N runs on device. The scheduler books one in-flight output
    # placeholder per emitting request; the runner feeds the unknown
    # token from the previous step's on-device samples (no host round
    # trip). Steps that need host token data (multi-step horizons,
    # penalties, spec drafts) drain the pipeline first. Ref analog:
    # vllm/v1/core/sched/async_scheduler.py (num_output_placeholders).
    async_scheduling: bool = False
    # Encoder cache budget (tokens of cached vision embeddings):
    # multimodal items are encoded once per content hash and reused
    # across requests; admission defers when a request's new items
    # exceed the free budget. Ref analog: encoder_cache_manager.py +
    # max_num_encoder_input_tokens (vllm/config/scheduler.py).
    encoder_cache_budget: int = 16384


# ---------------------------------------------------------------------------
# Parallel
# ---------------------------------------------------------------------------


@dataclass
class ParallelConfig:
    """Mesh axes. The reference builds NCCL process groups per strategy
    (ref: vllm/distributed/parallel_state.py:1742); on TPU these become
    named axes of one ``jax.sharding.Mesh`` and XLA inserts the
    collectives.
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # Microbatches per pipeline flush = S * this factor. Factor 1 =
    # classic GPipe M=S ((S-1)/(2S-1) bubble); larger factors shrink
    # the decode bubble toward (S-1)/(S*f + S - 1) at the cost of
    # smaller per-tick chunks (ref analog: max_concurrent_batches /
    # step_with_batch_queue depth, vllm v1/engine/core.py:621).
    pipeline_microbatch_factor: int = 1
    # Context parallelism (the reference's DCP/PCP,
    # decode_context_parallel_size parallel.py:342): paged-KV blocks
    # interleave over the ``cp`` mesh axis at block granularity — token
    # chunk j lives on rank j % cp — and attention merges per-rank
    # partials with one small (out, lse) all-gather (see
    # parallel/context.py).
    context_parallel_size: int = 1
    # EPLB — expert-parallel load balancing (ref: EPLBConfig,
    # vllm/config/parallel.py + vllm/distributed/eplb/). Physical
    # expert replicas (num_experts + num_redundant_experts) are
    # periodically re-packed onto EP ranks from observed routing load
    # (parallel/eplb.py).
    enable_eplb: bool = False
    num_redundant_experts: int = 0
    eplb_window: int = 1000  # EMA horizon (steps) for load tracking
    eplb_step_interval: int = 100  # steps between rebalances

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.pipeline_parallel_size * self.context_parallel_size)


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------

# Weight-quant method names we support (subset of the reference's 38-name
# QuantizationMethods registry, ref: vllm/model_executor/layers/
# quantization/__init__.py:12-47). "inc" covers AutoRound exports.
QuantMethod = Literal[
    "gptq", "awq", "auto_round",
    # compressed-tensors checkpoint schemes (llm-compressor exports):
    # pack-quantized WNA16, int-quantized W8A8, float-quantized FP8
    "ct_wna16", "ct_w8a8_int8", "ct_fp8",
    # FP8 checkpoints with per-tensor/channel weight scales (ref fp8.py)
    "fp8_ckpt",
    # online (quantize-at-load) shorthands
    "fp8", "int8", "w8a8_int8", "int4", "w4a8",
    # pre-quantized bitsandbytes NF4 checkpoints (quant/loader.py)
    "bnb4",
    # OCP microscaling (block-32 E8M0 shared scales; quant/mxfp.py)
    "mxfp4", "mxfp8", None,
]


@dataclass
class QuantizationConfig:
    """Weight quantization scheme resolved from the checkpoint.

    ``bits``/``group_size``/``sym`` follow the GPTQ/AWQ/AutoRound
    group-quant convention (ref: auto_gptq.py AutoGPTQConfig:97).
    """

    method: QuantMethod = None
    bits: int = 4
    group_size: int = 128
    sym: bool = True
    desc_act: bool = False  # g_idx activation reordering (GPTQ)
    lm_head_quantized: bool = False
    # raw checkpoint quantization_config dict for format-specific fields
    raw: dict[str, Any] = field(default_factory=dict, repr=False)

    @property
    def enabled(self) -> bool:
        return self.method is not None


# ---------------------------------------------------------------------------
# Speculative decoding
# ---------------------------------------------------------------------------


@dataclass
class SpeculativeConfig:
    """Ref analog: vllm/config/speculative.py. ``method=None`` disables.

    ngram: drafts come from matching the trailing prompt/output n-gram
    earlier in the sequence (ref: vllm/v1/spec_decode/ngram_proposer.py)
    — pure host logic, no draft model. Verification is greedy-only in
    round 1 (drafts are only proposed for temperature==0 requests).
    """

    method: Literal["ngram", "eagle", "eagle3", "mtp", "medusa",
                    "suffix", "draft_model", None] = None
    num_speculative_tokens: int = 4
    # n-gram match window: longest suffix tried first.
    prompt_lookup_max: int = 4
    prompt_lookup_min: int = 2
    # suffix decoding (ref: vllm/config/speculative.py:194): trie depth
    # bound, finished-response cache size (FIFO), draft-length factor
    # (draft <= factor x match length) and empirical-probability gate.
    suffix_decoding_max_tree_depth: int = 24
    suffix_decoding_max_cached_requests: int = 1000
    suffix_decoding_max_spec_factor: float = 1.0
    suffix_decoding_min_token_prob: float = 0.1
    # dynamic spec: [(range_start, range_end, k), ...] batch-size
    # schedule — runtime K caps to the entry covering the step's decode
    # batch size; 0 disables drafting at that size (ref:
    # vllm/v1/spec_decode/dynamic/utils.py). None = static K.
    num_speculative_tokens_per_batch_size: Optional[list] = None
    # draft_model: the drafter's own ModelConfig (its checkpoint is a
    # full causal LM; vocab must match the target).
    draft_config: Optional["ModelConfig"] = None
    # eagle/eagle3/mtp: draft checkpoint path (see spec_decode/eagle.py
    # for the per-method param schemas) and draft depth.
    model: Optional[str] = None
    draft_num_layers: int = 1
    # eagle3: which target layers feed the 3E aux stream. None = read
    # eagle_aux_hidden_state_layer_ids from the draft checkpoint's
    # config.json, falling back to the (2, N//2, N-3) default (ref:
    # gpu_model_runner.py:5545 honors the draft config before the
    # default).
    eagle_aux_layers: Optional[tuple] = None


# ---------------------------------------------------------------------------
# Composition root
# ---------------------------------------------------------------------------


@dataclass
class ObservabilityConfig:
    """Tracing/profiling knobs (ref analog: vllm/config/observability.py
    ObservabilityConfig: otlp_traces_endpoint, collect_detailed_traces).
    """

    # Emit one gen_ai.* span per finished request when either is set.
    otlp_traces_endpoint: Optional[str] = None
    trace_file: Optional[str] = None
    enable_tracing: bool = False


@dataclass
class KVTransferConfig:
    """Disaggregated prefill/decode transfer (ref analog:
    vllm/config/kv_transfer.py KVTransferConfig — kv_role
    kv_producer/kv_consumer + connector selection; transport here is
    the ZMQ connector, engine/kv_connector.py)."""

    # "prefill": this engine serves KV to decode engines on ``addr``.
    # "decode": this engine fetches prompt KV from ``addr``.
    role: Optional[str] = None
    addr: Optional[str] = None
    # Decode-side fetch timeout; on expiry the engine prefills locally.
    fetch_timeout_ms: int = 30000

    def __post_init__(self) -> None:
        if self.role not in (None, "prefill", "decode"):
            raise ValueError(f"kv_transfer.role {self.role!r} must be "
                             "'prefill' or 'decode'")
        if self.role is not None and not self.addr:
            raise ValueError("kv_transfer.role set but no addr")


@dataclass
class KVEventsConfig:
    """KV cache event publishing (ref analog: vllm/config/kv_events.py
    KVEventsConfig + vllm/distributed/kv_events.py): ZMQ PUB of
    BlockStored/BlockRemoved/AllBlocksCleared batches consumed by
    external prefix-aware routers."""

    enable_kv_cache_events: bool = False
    publisher: str = "zmq"
    endpoint: str = "tcp://*:5557"
    replay_endpoint: Optional[str] = None
    buffer_steps: int = 10_000
    topic: str = ""


@dataclass
class EngineConfig:
    """Everything the engine needs; analog of the reference VllmConfig
    (ref: vllm/config/vllm.py)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    quant: QuantizationConfig = field(default_factory=QuantizationConfig)
    speculative: SpeculativeConfig = field(
        default_factory=SpeculativeConfig)
    observability: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)
    kv_transfer: KVTransferConfig = field(
        default_factory=KVTransferConfig)
    kv_events: KVEventsConfig = field(default_factory=KVEventsConfig)
    seed: int = 0

    def __post_init__(self) -> None:
        # Scheduler must be able to schedule at least one full decode
        # round for all running seqs.
        if self.scheduler.max_num_batched_tokens < self.scheduler.max_num_seqs:
            self.scheduler.max_num_batched_tokens = self.scheduler.max_num_seqs

    @property
    def max_blocks_per_req(self) -> int:
        from vllm_tpu.utils import cdiv
        return cdiv(self.model.max_model_len, self.cache.block_size)

    def compile_key(self) -> str:
        """Stable hash over everything that affects compiled programs."""
        def enc(o: Any) -> Any:
            if dataclasses.is_dataclass(o) and not isinstance(o, type):
                return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
            return o
        blob = json.dumps(enc(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]
