"""Synchronous engine: add_request / step loop.

Ref analog: vllm/v1/engine/llm_engine.py (LLMEngine) + the in-proc
EngineCore (vllm/v1/engine/core.py EngineCore:103 — step() = schedule ->
execute -> update). Single process, single controller: on TPU the
executor boundary collapses (XLA owns the devices), so the engine calls
the runner directly; the multi-host control plane reintroduces a
transport at this same seam.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from vllm_tpu.config import EngineConfig
from vllm_tpu.core.request import Request, RequestStatus
from vllm_tpu.core.scheduler import Scheduler
from vllm_tpu.engine.output_processor import OutputProcessor
from vllm_tpu.engine.outputs import RequestOutput
from vllm_tpu.engine.tokenizer import Tokenizer
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.utils import Counter, cdiv, init_logger
from vllm_tpu.worker.runner import TPUModelRunner

logger = init_logger(__name__)


class LLMEngine:

    def __init__(
        self,
        config: EngineConfig,
        params: Optional[dict] = None,
        tokenizer: Optional[Tokenizer] = None,
        mesh=None,
        draft_params: Optional[dict] = None,  # EAGLE draft weights
    ) -> None:
        self.config = config
        mc = config.model

        # Persistent compile cache: serialized XLA executables keyed
        # under the engine-config hash, so a second process start skips
        # the bucket-ladder compiles (ref analog: vllm/compilation/
        # caching.py artifact cache). Must run before the first jit.
        from vllm_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(config)

        if tokenizer is None and mc.model:
            try:
                from vllm_tpu.engine.tokenizer_registry import get_tokenizer
                tokenizer = get_tokenizer(
                    mc.model, mode=getattr(mc, "tokenizer_mode", "auto"))
            except Exception as e:  # tokenizer-free (token-id) mode
                logger.warning("no tokenizer loaded: %s", e)
        self.tokenizer = tokenizer

        if mc.mamba_num_heads or mc.gdn:
            # SSM/GDN state is per-request, not per-block: prefix-cache
            # hits would skip tokens whose state was never accumulated
            # (ref analog: prefix caching disabled for mamba models).
            config.cache.enable_prefix_caching = False

        # Encoder-only models (BERT-class embedders) attend
        # bidirectionally: a prompt must never split across prefill
        # chunks (ref analog: chunked prefill disabled for pooling
        # models, vllm/config/__init__.py verify_with_model).
        from vllm_tpu.models.registry import get_model
        if getattr(get_model(mc.architecture), "REQUIRES_FULL_PREFILL",
                   False):
            config.scheduler.enable_chunked_prefill = False
            config.cache.enable_prefix_caching = False
            if config.scheduler.max_num_batched_tokens < mc.max_model_len:
                raise ValueError(
                    "encoder-only models need max_num_batched_tokens "
                    f">= max_model_len ({mc.max_model_len}): whole-"
                    "prompt bidirectional attention cannot chunk")

        if params is None:
            params = self._load_params()

        if (mc.sparse_index is not None
                and config.cache.cache_dtype not in ("auto", "bfloat16",
                                                     "float32")):
            raise NotImplementedError(
                "DSA sparse attention (DeepSeek-V3.2) currently "
                "requires an unquantized latent cache (the sparse "
                "gather path reads raw latent rows)")
        num_blocks = self._determine_num_kv_blocks()
        cp = config.parallel.context_parallel_size
        if cp > 1:
            # Context parallelism: per-device sizing stays what the
            # memory probe computed; the *global* pool is cp x that,
            # GSPMD-sharded over the cp axis (parallel/context.py).
            # SSM/GDN state caches are per-request and O(1) in context
            # length — they stay REPLICATED over cp (the recurrent ops
            # are pure lax under GSPMD-auto, so sharded-token inputs
            # partition correctly); only the paged attention KV — the
            # part that actually grows with context — shards over the
            # cp axis. Hybrid models therefore pass through: attention
            # layers get the cp pool, mamba/GDN layers replicate.
            # DSA models shard BOTH paged caches (latent + indexer-K)
            # over cp (models/deepseek.py make_caches); the sparse
            # score/gather path is pure XLA under GSPMD-auto.
            num_blocks = num_blocks * cp
        # Guard: every request must be able to fit (a request needing
        # more blocks than the pool stalls the scheduler forever).
        # Sliding-window models free out-of-window blocks, so the
        # per-request requirement is bounded by the window (+ one block
        # of slack for the partially-dead leading block).
        kv_capacity = (num_blocks - 1) * config.cache.block_size
        per_req_need = mc.max_model_len
        if mc.sliding_window is not None:
            per_req_need = min(per_req_need,
                               mc.sliding_window + config.cache.block_size)
        if per_req_need > kv_capacity:
            raise ValueError(
                f"max per-request KV {per_req_need} tokens exceeds KV "
                f"capacity {kv_capacity} tokens ({num_blocks} blocks x "
                f"{config.cache.block_size}); lower max_model_len or "
                f"raise num_kv_blocks/memory")

        self._num_kv_blocks = num_blocks
        self.scheduler = Scheduler(config, num_blocks=num_blocks)
        self.runner = TPUModelRunner(config, params, num_blocks, mesh=mesh)
        self._draft_params = draft_params
        self._install_proposers()
        # Host KV tier: scheduler owns the index, runner moves bytes.
        if self.scheduler.host_kv_pool is not None:
            self.runner.host_kv_pool = self.scheduler.host_kv_pool
        self.output_processor = OutputProcessor(self.tokenizer)
        # Disagg P/D decode role: fetch prompt KV from the prefill
        # engine at admission (engine/kv_connector.py; ref analog:
        # KVConnectorBase_V1 consumer role, kv_connector/v1/base.py:171).
        self.kv_client = None
        kt = config.kv_transfer
        if kt.role == "decode":
            from vllm_tpu.engine.kv_connector import KVConnectorClient
            self.kv_client = KVConnectorClient(
                kt.addr, timeout_ms=kt.fetch_timeout_ms)
        # KV event publishing (ref: vllm/distributed/kv_events.py):
        # the pool emits into a step-scoped sink; step() flushes one
        # seq-numbered ZMQ batch.
        self.kv_event_publisher = None
        self._kv_event_sink = None
        ke = config.kv_events
        if ke.enable_kv_cache_events:
            from vllm_tpu.engine.kv_events import (KVEventSink,
                                                   ZmqEventPublisher)
            self._kv_event_sink = KVEventSink()
            for pool in self.scheduler.kv_cache_manager.pools:
                pool.events = self._kv_event_sink
            self.kv_event_publisher = ZmqEventPublisher(
                endpoint=ke.endpoint,
                replay_endpoint=ke.replay_endpoint,
                topic=ke.topic, buffer_steps=ke.buffer_steps)
        self._req_counter = Counter()
        # Async scheduling: the one in-flight (sched_out, StepHandle,
        # t0) while the next step is being scheduled/prepared.
        self._inflight = None
        from vllm_tpu.metrics import EngineMetrics, LoggingStatLogger
        oc = config.observability
        self.tracer = None
        if oc.enable_tracing or oc.trace_file or oc.otlp_traces_endpoint:
            from vllm_tpu.tracing import Tracer
            self.tracer = Tracer(trace_file=oc.trace_file,
                                 otlp_endpoint=oc.otlp_traces_endpoint)
        self.metrics = EngineMetrics(tracer=self.tracer,
                                     model_name=mc.model or
                                     mc.architecture)
        self.stat_logger = LoggingStatLogger(self.metrics)
        from vllm_tpu.engine.state import SleepManager
        self._sleep = SleepManager(self)
        # RL weight-sync version (engine/weight_transfer.py; ref:
        # set_weight_version, vllm/v1/engine/core.py:958).
        self.weight_version = 0

        # EOS propagation to the scheduler's stop check.
        if not getattr(mc, "eos_token_ids", None):
            eos = (self.tokenizer.eos_token_id
                   if self.tokenizer is not None else None)
            mc.eos_token_ids = [eos] if eos is not None else []  # type: ignore[attr-defined]

    # -- init helpers -------------------------------------------------
    def _load_params(self) -> dict:
        from vllm_tpu.loader.safetensors_loader import load_llama_params
        mc, qc = self.config.model, self.config.quant
        logger.info("loading weights from %s", mc.model)
        if str(mc.model).endswith(".gguf"):
            # llama.cpp checkpoints (ref analog: gguf quantization
            # path): block-quant tensors dequantize at load; online
            # re-quantization applies below when requested.
            from vllm_tpu.loader.gguf_loader import load_gguf_params
            params = load_gguf_params(mc.model, mc)
            if qc.enabled and qc.method:
                from vllm_tpu.quant.online import quantize_params_online
                params = quantize_params_online(params, qc.method)
            return params
        if qc.enabled and qc.method in ("int4", "w4a8", "int8",
                                        "w8a8_int8", "fp8", "mxfp4",
                                        "mxfp8"):
            # Online quantization: dense load, then transform
            # (ref analog: online/base.py quantize-at-load).
            from vllm_tpu.quant.online import quantize_params_online
            params = load_llama_params(mc.model, mc, None)
            return quantize_params_online(params, qc.method)
        return load_llama_params(mc.model, mc,
                                 qc if qc.enabled else None)

    def _determine_num_kv_blocks(self) -> int:
        cc = self.config.cache
        if cc.num_gpu_blocks is not None:
            return cc.num_gpu_blocks
        # Memory-based sizing (ref analog: determine_available_memory,
        # gpu_worker.py:461): device memory x utilization - weights.
        mc = self.config.model
        from vllm_tpu.ops.kv_cache import kv_cache_bytes_per_block
        per_block_bytes = kv_cache_bytes_per_block(
            cc.block_size, mc.num_kv_heads, mc.head_dim, cc.cache_dtype,
            mc.dtype) * mc.num_layers
        try:
            import jax
            dev = jax.local_devices()[0]
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit")
            in_use = stats.get("bytes_in_use", 0)
            if limit:
                free = limit * cc.gpu_memory_utilization - in_use
                num = int(free // per_block_bytes)
                if num > 1:
                    return num
        except Exception:
            pass
        # Fallback: enough for max_num_seqs full-length sequences,
        # capped at 512 MiB of KV.
        want = (self.config.scheduler.max_num_seqs *
                self.config.max_blocks_per_req + 1)
        cap = max(2, int(512 * 2**20) // per_block_bytes)
        return min(want, cap)

    # -- API ----------------------------------------------------------
    def add_lora(self, name: str, path: Optional[str] = None,
                 adapter=None) -> int:
        """Register a LoRA adapter (PEFT checkpoint dir, or an
        in-memory LoRAAdapter). Ref analog: LLMEngine.add_lora /
        LoRAModelManager (vllm/lora/model_manager.py)."""
        from vllm_tpu.lora import LoRARegistry, load_peft_adapter
        if self.runner.lora_registry is None:
            reg = LoRARegistry(self.config.model.num_layers,
                               model_config=self.config.model)
        else:
            reg = self.runner.lora_registry
        if adapter is None:
            assert path is not None, "need path or adapter"
            adapter = load_peft_adapter(name, path)
        slot = reg.add(adapter)
        self.runner.set_lora_registry(reg)
        return slot

    def remove_lora(self, name: str) -> None:
        """Unload a LoRA adapter (ref analog: /v1/unload_lora_adapter
        -> LoRAModelManager.remove_adapter). Refused while any live
        request still routes through it."""
        reg = self.runner.lora_registry
        if reg is None:
            raise KeyError(f"unknown LoRA adapter {name!r}")
        for req in self.scheduler.requests.values():
            if getattr(req, "lora_name", None) == name:
                raise ValueError(
                    f"LoRA {name!r} is in use by {req.request_id}")
        reg.remove(name)
        self.runner.set_lora_registry(reg)

    def add_request(
        self,
        prompt: Union[str, list[int]],
        params: Optional[SamplingParams] = None,
        request_id: Optional[str] = None,
        priority: int = 0,
        lora_name: Optional[str] = None,
        pooling_params=None,
        kv_transfer=None,  # KVTransferPayload from a prefill engine
        multi_modal_data=None,  # {"image": np [N,3,H,W]}
    ) -> str:
        params = params or SamplingParams()
        if request_id is None:
            request_id = str(next(self._req_counter))
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompt needs tokenizer"
            prompt_token_ids = self.tokenizer.encode(prompt)
            prompt_text = prompt
        else:
            prompt_token_ids = list(prompt)
            prompt_text = None
        if params.guided:
            params._grammar = self._get_grammar(params)  # type: ignore[attr-defined]
        if lora_name is not None:
            reg = self.runner.lora_registry
            if reg is None:
                raise ValueError("no LoRA adapters registered")
            try:
                reg.slot_of(lora_name)  # validate early
            except KeyError as e:
                raise ValueError(str(e)) from e
        mm_hash = None
        mm_item_hashes = mm_item_tokens = None
        if (multi_modal_data is not None
                and "audio" in multi_modal_data):
            # Whisper-class: audio enters via cross-attention, not
            # token expansion. Hash the mel features for encoder-cache
            # reuse (ref analog: the transcription request path,
            # vllm/entrypoints/openai/speech_to_text.py).
            import hashlib as _hashlib
            assert self.config.model.audio is not None, (
                "model has no audio encoder")
            mel = np.ascontiguousarray(multi_modal_data["audio"])
            mm_hash = _hashlib.sha256(mel.tobytes()).hexdigest()
            mm_item_hashes = [mm_hash]
            # Encoder-cache budget accounting in frames (the slab the
            # runner keeps per cached audio clip).
            mm_item_tokens = [
                self.config.model.audio["max_source_positions"]]
        elif multi_modal_data is not None:
            # Expand each image placeholder to one token per patch
            # (the processor's replacement step, ref: llava input
            # mapper) and fold the image content into block hashing.
            import hashlib as _hashlib
            mc = self.config.model
            assert mc.vision is not None, "model is not multimodal"
            tok = mc.image_token_index
            grids = multi_modal_data.get("image_grid_thw") \
                if hasattr(multi_modal_data, "get") else None
            if grids is not None:
                # Qwen2-VL class: one token per *merged* patch, count
                # varies per image grid (t*h*w / merge^2).
                merge = mc.vision.get("spatial_merge_size", 2)
                counts = [int(t * h * w) // (merge * merge)
                          for t, h, w in grids]
                expanded: list[int] = []
                gi = 0
                for t in prompt_token_ids:
                    if t == tok:
                        expanded.extend([tok] * counts[gi])
                        gi += 1
                    else:
                        expanded.append(t)
                assert gi == len(counts), (
                    f"{gi} image tokens but {len(counts)} grids")
                imgs = multi_modal_data["image"]
                # Per-image content hashes over each grid's patch span
                # (encoder cache keys; ref: MultiModalHasher).
                mm_item_tokens = counts
                mm_item_hashes = []
                off = 0
                for (t, h, w) in grids:
                    s = int(t * h * w)
                    span = np.ascontiguousarray(imgs[off:off + s])
                    mm_item_hashes.append(_hashlib.sha256(
                        span.tobytes() + repr((t, h, w)).encode()
                    ).hexdigest())
                    off += s
            else:
                from vllm_tpu.models.llava import num_patches
                P = num_patches(mc)
                expanded = []
                for t in prompt_token_ids:
                    expanded.extend([tok] * P if t == tok else [t])
                n_imgs = sum(1 for t in prompt_token_ids if t == tok)
                imgs = multi_modal_data["image"]
                assert imgs.shape[0] == n_imgs, (
                    f"{n_imgs} image tokens but {imgs.shape[0]} images")
                mm_item_tokens = [P] * n_imgs
                mm_item_hashes = [
                    _hashlib.sha256(
                        np.ascontiguousarray(imgs[i]).tobytes()
                    ).hexdigest() for i in range(n_imgs)
                ]
            prompt_token_ids = expanded
            mm_hash = _hashlib.sha256(
                np.ascontiguousarray(imgs).tobytes()).hexdigest()
            budget = self.config.scheduler.encoder_cache_budget
            if mm_item_tokens and sum(mm_item_tokens) > budget:
                raise ValueError(
                    f"request needs {sum(mm_item_tokens)} encoder-cache "
                    f"tokens but the budget is {budget} "
                    "(scheduler.encoder_cache_budget)")
        request = Request(request_id, prompt_token_ids, params,
                          priority=priority, lora_name=lora_name,
                          pooling_params=pooling_params,
                          mm_data=multi_modal_data, mm_hash=mm_hash,
                          mm_item_hashes=mm_item_hashes,
                          mm_item_tokens=mm_item_tokens)
        if (kv_transfer is None and self.kv_client is not None
                and pooling_params is None
                and len(prompt_token_ids) >= self.config.cache.block_size):
            kv_transfer = self.kv_client.fetch(prompt_token_ids,
                                               request_id)
        if kv_transfer is not None:
            # Disagg P/D decode side (ref analog: KVConnector inject,
            # vllm/distributed/kv_transfer/): the payload region skips
            # prefill; the runner writes it into the allocated blocks.
            request.remote_kv = kv_transfer  # type: ignore[attr-defined]
            self.runner.kv_payloads[request_id] = kv_transfer
        self.scheduler.add_request(request)
        self.metrics.on_request_added(request_id, len(prompt_token_ids),
                                      params)
        self.output_processor.add_request(request_id, prompt_text,
                                          prompt_token_ids, params)
        return request_id

    def _get_grammar(self, params: SamplingParams):
        """Compile (or fetch cached) grammar for guided decoding.

        Compiled grammars are cached by constraint so repeated
        requests share one FSM and its per-state bitmask cache (ref
        analog: StructuredOutputManager's grammar cache,
        v1/structured_output/__init__.py)."""
        assert self.tokenizer is not None, "guided decoding needs a tokenizer"
        import json as _json
        eos = (self.config.model.eos_token_ids or [None])[0]
        V = self.config.model.vocab_size
        cache = getattr(self, "_grammar_cache", None)
        if cache is None:
            cache = self._grammar_cache = {}
        if params.guided_choice:
            key = ("choice", tuple(params.guided_choice))
        elif params.guided_regex:
            key = ("regex", params.guided_regex)
        elif params.guided_grammar:
            key = ("ebnf", params.guided_grammar)
        else:
            schema = params.guided_json
            key = ("json", schema if isinstance(schema, str) else
                   _json.dumps(schema, sort_keys=True))
        hit = cache.get(key)
        if hit is not None:
            return hit
        if key[0] == "choice":
            from vllm_tpu.structured_output.trie import \
                build_choice_grammar
            g = build_choice_grammar(params.guided_choice, self.tokenizer,
                                     eos)
        else:
            from vllm_tpu.structured_output import cfg, token_fsm
            bt = getattr(self, "_token_byte_table", None)
            if bt is None:
                bt = self._token_byte_table = \
                    token_fsm._token_byte_matrix(self.tokenizer, V)
            if key[0] == "regex":
                g = token_fsm.build_regex_grammar(params.guided_regex,
                                                  self.tokenizer, V, eos,
                                                  bt)
            elif key[0] == "ebnf":
                g = cfg.build_ebnf_grammar(params.guided_grammar,
                                           self.tokenizer, V, eos, bt)
            elif cfg.schema_needs_cfg(params.guided_json):
                # Recursive / open schemas are beyond a regular
                # language — pushdown backend (ref: xgrammar's
                # from_json_schema, backend_xgrammar.py:168).
                g = cfg.build_json_cfg_grammar(params.guided_json,
                                               self.tokenizer, V, eos, bt)
            else:
                g = token_fsm.build_json_grammar(params.guided_json,
                                                 self.tokenizer, V, eos,
                                                 bt)
        cache[key] = g
        return g

    def extract_kv(self, prompt_token_ids: list[int]):
        """Disagg P/D prefill side: pull the prompt's full-block KV out
        of the device prefix cache as a host payload (ref analog: the
        KVConnector extract path). Returns None when no prefix blocks
        are cached. Run the prompt through this engine first (e.g.
        max_tokens=1); finished requests leave their blocks in the
        content-addressed cache."""
        from vllm_tpu.core.block_pool import hash_block_tokens
        from vllm_tpu.core.kv_offload import KVTransferPayload
        cc = self.config.cache
        bs = cc.block_size
        mgr = self.scheduler.kv_cache_manager
        block_ids, h = [], None
        for i in range(len(prompt_token_ids) // bs):
            chunk = tuple(prompt_token_ids[i * bs:(i + 1) * bs])
            h = hash_block_tokens(h, chunk, None,
                                  cc.prefix_caching_hash_algo)
            block = mgr._pool_of_chunk(i).get_cached_block(h)
            if block is None:
                break
            block_ids.append(block.block_id)
        if not block_ids:
            return None
        datas, scales = self.runner.read_blocks(block_ids)
        return KVTransferPayload(
            num_tokens=len(block_ids) * bs,
            data=datas,
            scales=None if scales[0] is None else scales,
        )

    def abort_request(self, request_ids: list[str]) -> None:
        self.scheduler.finish_requests(request_ids,
                                       RequestStatus.FINISHED_ABORTED)
        for rid in request_ids:
            self.output_processor.abort(rid)

    def reinitialize(self) -> None:
        """Fault-recovery re-init (ref analog: EngineCoreSentinel.retry
        engine_core_sentinel.py:122 + WorkerSentinel device cleanup):
        abort everything in flight, rebuild the scheduler's KV
        bookkeeping from scratch, and reset the runner's device state
        (fresh KV caches + persistent batch) while keeping loaded
        weights and compiled programs."""
        self.abort_request(list(self.scheduler.requests))
        self._inflight = None  # stale device step references old state
        self.scheduler = Scheduler(self.config,
                                   num_blocks=self._num_kv_blocks)
        if self.scheduler.host_kv_pool is not None:
            self.runner.host_kv_pool = self.scheduler.host_kv_pool
        self.runner.reset_state()
        logger.warning("engine reinitialized after fault: KV caches "
                       "reset, weights kept")

    def _install_proposers(self) -> None:
        """Install the configured speculative drafter on the current
        runner, loading draft weights once and caching them in
        ``self._draft_params`` so a runner rebuild (elastic EP rescale)
        reuses them (ref analog: drafter construction in
        GPUModelRunner.__init__ when speculative_config is set)."""
        sc = self.config.speculative
        mc = self.config.model
        draft_params = self._draft_params
        if sc.method in ("eagle", "eagle3", "mtp"):
            if draft_params is None:
                from vllm_tpu.spec_decode import eagle as eagle_mod
                assert sc.model, (
                    f"{sc.method} needs speculative.model or draft_params")
                dcfg = eagle_mod.draft_config_from_target(
                    mc, sc.draft_num_layers)
                loader = {
                    "eagle": eagle_mod.load_eagle_params,
                    "eagle3": eagle_mod.load_eagle3_params,
                    "mtp": eagle_mod.load_mtp_params,
                }[sc.method]
                draft_params = loader(sc.model, dcfg)
            self.runner.set_eagle_proposer(draft_params,
                                           method=sc.method)
        elif sc.method == "medusa":
            if draft_params is None:
                from vllm_tpu.spec_decode.medusa import load_medusa_params
                assert sc.model, "medusa needs speculative.model or " \
                                 "draft_params"
                draft_params = load_medusa_params(sc.model, mc)
            self.runner.set_medusa_proposer(draft_params)
        elif sc.method == "draft_model":
            dcfg = sc.draft_config
            assert dcfg is not None, (
                "draft_model needs speculative.draft_config (the "
                "drafter's own ModelConfig)")
            if draft_params is None:
                from vllm_tpu.loader.safetensors_loader import (
                    load_llama_params)
                assert sc.model, "draft_model needs speculative.model " \
                                 "or draft_params"
                draft_params = load_llama_params(sc.model, dcfg, None)
            self.runner.set_draft_model_proposer(draft_params, dcfg)
        self._draft_params = draft_params

    def scale_ep(self, new_ep: int, devices=None,
                 tensor_parallel_size: Optional[int] = None) -> None:
        """Elastic EP — resize the expert-parallel world at runtime.

        Ref analog: vllm/distributed/elastic_ep/elastic_state.py
        (scale-up/scale-down reconfiguration: pause scheduling, drain
        in-flight work, rebuild process groups, reshuffle experts) and
        the engine hook vllm/v1/engine/core.py:989-996. TPU-native
        formulation: there are no process groups to rebuild — the EP
        world IS the ``ep`` axis of the device mesh, so a rescale is
        (1) drain the in-flight async step, (2) preempt every running
        request to the waiting queue (recompute-on-resume — the same
        path mid-stream preemption already takes, so greedy outputs
        are unchanged), (3) collapse EPLB physical expert stacks back
        to logical, (4) build the new mesh and a new runner: GSPMD
        re-device_put moves the expert shards between ranks (XLA emits
        the collective the reference hand-codes in
        rebalance_execute.py), and the persistent compile cache makes
        the new-topology compile a warm hit on repeat topologies.

        ``tensor_parallel_size`` lets a fixed device pool trade tp for
        ep (scale-up without new hardware); by default tp is kept and
        the new mesh needs ``new_ep x tp`` devices.
        """
        if self._inflight is not None:
            # Finish the launched step; its outputs land in the
            # output processor as usual before the drain.
            self._finish_inflight()
        self.scheduler.preempt_all()
        # Device KV is discarded with the runner: cached prefix blocks
        # would dangle, so drop the content-addressed index too.
        self.scheduler.kv_cache_manager.reset_prefix_cache()
        params = self.runner.export_logical_params()
        pc = self.config.parallel
        pc.expert_parallel_size = new_ep
        if tensor_parallel_size is not None:
            pc.tensor_parallel_size = tensor_parallel_size
        # Keep e_phys divisible by the new world: top up redundant
        # replicas to the next multiple (the reference requires the
        # same invariant of its placement, rebalance_algo.py).
        if pc.enable_eplb and self.config.model.num_experts:
            base = getattr(self, "_base_redundant", None)
            if base is None:
                self._base_redundant = base = pc.num_redundant_experts
            e = self.config.model.num_experts + base
            pc.num_redundant_experts = base + (-e) % max(new_ep, 1)
        from vllm_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(pc, devices)
        self.runner = TPUModelRunner(self.config, params,
                                     self._num_kv_blocks, mesh=mesh)
        self._install_proposers()
        if self.scheduler.host_kv_pool is not None:
            self.runner.host_kv_pool = self.scheduler.host_kv_pool
        logger.info("elastic EP rescale: ep=%d tp=%d (%d requests "
                    "re-queued)", pc.expert_parallel_size,
                    pc.tensor_parallel_size, len(self.scheduler.waiting))

    def step(self) -> list[RequestOutput]:
        import time as _time
        if self.config.scheduler.async_scheduling:
            return self._step_async()
        t0 = _time.monotonic()
        sched_out = self.scheduler.schedule()
        runner_out = self.runner.execute_model(sched_out)
        core_outputs = self.scheduler.update_from_output(
            sched_out, runner_out)
        if self.runner.eplb is not None:
            self.runner.maybe_rebalance_eplb()
        results, to_abort = self.output_processor.process_outputs(
            core_outputs)
        if to_abort:
            self.scheduler.finish_requests(to_abort,
                                           RequestStatus.FINISHED_STOPPED)
        self._flush_kv_events()
        self.metrics.on_step(core_outputs, self.scheduler.make_stats(),
                             _time.monotonic() - t0)
        self.stat_logger.maybe_log()
        return results

    def _step_async(self) -> list[RequestOutput]:
        """Overlapped step (SchedulerConfig.async_scheduling): schedule
        and launch step N+1, then apply step N's (already executing)
        results — host prepare overlaps device execution (ref analog:
        async_scheduler.py + step_with_batch_queue, core.py:621).

        Steps whose host bookkeeping needs this step's tokens (multi-
        step horizons read host token lists; penalty/grammar/logprob
        requests build host-side stats) drain the pipeline right away —
        identical semantics, no overlap."""
        import time as _time
        t0 = _time.monotonic()
        sched_out = self.scheduler.schedule()
        results: list[RequestOutput] = []
        # Pipelined multi-step: a horizon launch whose current tokens
        # are neither host-known nor device-carried must wait for the
        # in-flight step's results first (drain-before-launch). When
        # the carry covers (steady-state decode), horizon N+1 launches
        # while N's outputs are still on device — host bookkeeping of
        # N overlaps device compute of N+1.
        if (sched_out.decode_horizon > 1 and self._inflight is not None
                and not self.runner.ms_carry_covers(sched_out)):
            results += self._finish_inflight()
        handle = self.runner.launch_step(sched_out)
        if self._inflight is not None:
            results += self._finish_inflight()
        self._inflight = (sched_out, handle, t0)
        if self._needs_host_data(sched_out):
            results += self._finish_inflight()
        return results

    def _needs_host_data(self, sched_out) -> bool:
        for req_id in sched_out.num_scheduled_tokens:
            r = self.scheduler.requests.get(req_id)
            if r is None:
                return True
            sp = r.sampling_params
            if (r.pooling_params is not None or sp.logprobs or sp.guided
                    or sp.prompt_logprobs
                    or getattr(sp, "_grammar", None) is not None
                    or sp.has_penalties):
                return True
        return False

    def _finish_inflight(self) -> list[RequestOutput]:
        import time as _time
        sched_out, handle, t0 = self._inflight
        self._inflight = None
        runner_out = self.runner.finish_step(handle)
        core_outputs = self.scheduler.update_from_output(
            sched_out, runner_out)
        if self.runner.eplb is not None:
            self.runner.maybe_rebalance_eplb()
        results, to_abort = self.output_processor.process_outputs(
            core_outputs)
        if to_abort:
            self.scheduler.finish_requests(to_abort,
                                           RequestStatus.FINISHED_STOPPED)
        self._flush_kv_events()
        self.metrics.on_step(core_outputs, self.scheduler.make_stats(),
                             _time.monotonic() - t0)
        self.stat_logger.maybe_log()
        return results

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_requests()

    def _flush_kv_events(self) -> None:
        if self.kv_event_publisher is not None:
            self.kv_event_publisher.publish(self._kv_event_sink.drain())

    def step_dummy(self) -> None:
        """Execute the forward program with no real tokens (DP wave
        lockstep participation; see engine/dp.py)."""
        self.runner.execute_dummy()

    def warmup(self) -> None:
        """Pre-compile the program ladder by running dummy generations
        through the real path (ref analog: compile_or_warm_up_model,
        gpu_worker.py:680).

        The reachable program set is structured: decode-ish steps
        (q_blk=16) only produce small token buckets (~R+slack), while
        prefill/mixed steps (q_blk=128) produce buckets >= 256. One
        sequential dummy request per prefill bucket + one batch of
        small requests covers every program a serve workload hits.
        """
        import time as _time
        t0 = _time.monotonic()
        R = self.config.scheduler.max_num_seqs
        budget = self.config.scheduler.max_num_batched_tokens
        horizon = max(2, self.config.scheduler.multi_step_decode_horizon)
        max_len = self.config.model.max_model_len
        cap_len = max_len - horizon - 4

        saved_eos = getattr(self.config.model, "eos_token_ids", [])
        self.config.model.eos_token_ids = []  # type: ignore[attr-defined]
        sp = lambda: SamplingParams(temperature=0.0,
                                    max_tokens=horizon + 2,
                                    ignore_eos=True, detokenize=False)

        def drain(limit):
            n = 0
            while self.scheduler.has_unfinished_requests() and n < limit:
                self.step()
                n += 1
            return n

        steps = 0
        # Wave A: one request per prefill bucket (>=256), sequentially.
        lengths, b = [], 256
        from vllm_tpu.utils import round_up
        while b <= round_up(budget, 128):
            lengths.append(min(b - 128, cap_len, budget))
            b *= 2
        lengths.append(min(budget, cap_len))
        for i, L in enumerate(dict.fromkeys(lengths)):
            self.add_request([1] * max(L, 4), sp(),
                             request_id=f"warmup-a{i}")
            steps += drain(3 * horizon + 8)
        # Wave B: a batch of small requests (decode buckets with many
        # active rows + the multi-step loop).
        for i in range(R):
            self.add_request([1] * 8, sp(), request_id=f"warmup-b{i}")
        steps += drain(4 * R)
        self.config.model.eos_token_ids = saved_eos  # type: ignore[attr-defined]
        # Dummy requests must not pollute the prefix cache.
        self.scheduler.kv_cache_manager.reset_prefix_cache()
        logger.info("warmup: %d steps, %.1fs", steps,
                    _time.monotonic() - t0)

    # -- profiling (ref: EngineCore.profile, vllm/v1/engine/core.py:765,
    # /start_profile + /stop_profile endpoints) -----------------------
    def start_profile(self, log_dir: Optional[str] = None) -> str:
        from vllm_tpu.tracing import start_profile
        return start_profile(log_dir)

    def stop_profile(self) -> None:
        from vllm_tpu.tracing import stop_profile
        stop_profile()

    # -- state management (ref: engine sleep/wake core.py:864-922,
    # sharded save/restore gpu_worker.py:1190) ------------------------
    @property
    def is_sleeping(self) -> bool:
        return self._sleep.is_sleeping

    def sleep(self, level: int = 1) -> None:
        """Free HBM: level 1 offloads weights to host RAM and drops
        KV; level 2 drops both (wake reloads from disk)."""
        self._sleep.sleep(level)

    def wake_up(self) -> None:
        self._sleep.wake_up()

    def apply_weight_update(self, flat, version: int) -> None:
        """Install a (partial) weight update between steps (RL
        weight-sync; engine/weight_transfer.py)."""
        from vllm_tpu.engine.weight_transfer import apply_weight_update
        apply_weight_update(self, flat, version)

    def save_state(self, path: str) -> None:
        from vllm_tpu.engine.state import save_state
        save_state(self.runner.params, path)

    def load_state(self, path: str) -> None:
        """In-place weight reload (RL weight-sync analog,
        ref: reload_weights gpu_worker.py:456)."""
        import jax.numpy as jnp
        from vllm_tpu.engine.state import load_state
        params = load_state(path)
        import jax
        params = jax.tree.map(jnp.asarray, params)
        if self.runner.mesh is not None:
            from vllm_tpu.parallel.shard import shard_params
            params = shard_params(params, self.config.model,
                                  self.runner.mesh)
        self.runner.params = params
