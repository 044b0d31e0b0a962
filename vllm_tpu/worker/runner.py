"""TPU model runner — the hot path.

Consumes SchedulerOutput, maintains the fixed-row persistent batch,
builds padded device inputs, runs the jitted step (forward + KV
write-through + sampling fused in one XLA program), returns
ModelRunnerOutput.

TPU-native translation of GPUModelRunner (ref: vllm/v1/worker/
gpu_model_runner.py ``_update_states():1233`` / ``_prepare_inputs():
2001`` / ``execute_model():4214``) redesigned per Model Runner V2
(ref: vllm/v1/worker/gpu/model_runner.py, docs/design/model_runner_v2.md):
- fixed-row persistent state, no compaction
- static shapes: token dim padded to a power-of-2 bucket ladder
  (the analog of the CUDA-graph padding ladder,
  ref: vllm/v1/cudagraph_dispatcher.py) — one compiled program per
  bucket, R pinned at max_num_reqs
- KV caches donated through jit: XLA updates them in place
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import EngineConfig
from vllm_tpu.core.sched_output import ModelRunnerOutput, SchedulerOutput
from vllm_tpu.models.registry import get_model
from vllm_tpu.ops.kv_cache import (kv_cache_bytes_per_block,
                                   kv_cache_jnp_dtype, kv_cache_shape,
                                   make_kv_cache)
from vllm_tpu.ops.metadata import AttentionMetadata
from vllm_tpu.sample.sampler import (PenaltyInputs, SamplingMetadata,
                                     apply_penalties, compute_topk_logprobs,
                                     sample, spec_rejection_outputs)
from vllm_tpu.utils import cdiv, init_logger, padded_bucket
from vllm_tpu.worker.input_batch import InputBatch

logger = init_logger(__name__)


class DecodeLoopInputs(NamedTuple):
    cur_tokens: jax.Array  # [R] the single known token per row
    positions: jax.Array  # [R] position of that token
    block_tables: jax.Array  # [R, max_blocks]
    active: jax.Array  # [R] bool
    sampling: SamplingMetadata
    lora_idx: Optional[jax.Array] = None  # [R] adapter slot per row
    # mrope (Qwen2-VL): rope runs at position + delta per row (equal
    # t/h/w rows reduce mrope to 1-D rope at the shifted position).
    mrope_delta: Optional[jax.Array] = None  # [R]


class StepInputs(NamedTuple):
    input_ids: jax.Array  # [T]
    positions: jax.Array  # [T]
    slot_mapping: jax.Array  # [T]
    block_tables: jax.Array  # [R, max_blocks]
    query_start_loc: jax.Array  # [R+1]
    seq_lens: jax.Array  # [R]
    logits_indices: jax.Array  # [R, K+1] last-token gather indices
    sampling: SamplingMetadata
    # None on penalty-free steps (the common case; separate compiled
    # variant when set — ref analog: penalties applied in Sampler).
    penalties: Optional[PenaltyInputs]
    # None when no structured-output request is scheduled; else a
    # packed [R, ceil(V/32)] uint32 allow-bitmask, unpacked on device
    # (ref analog: the grammar bitmask applied at sampling,
    # v1/structured_output/ — 32x less host work + H2D than bools).
    grammar_mask: Optional[jax.Array]
    # Spec decode only: [R, K+1] draft token per verification column
    # (-1 where no draft; column K is the bonus position).
    draft_targets: Optional[jax.Array] = None
    # Draft distributions [max_R, K, V] from the device drafter's
    # proposal step (EAGLE/MTP with the target LM head) — drives the
    # p/q accept ratio + residual recovery (ref: rejection_sampler.py
    # draft-probs branch). None for ngram/suffix/greedy point-mass.
    draft_probs: Optional[jax.Array] = None
    # Multi-LoRA: [T] adapter slot per token row (None = no adapters
    # registered; see lora/ and ops/lora.py).
    lora_idx: Optional[jax.Array] = None
    # Multimodal (VLM): projected patch embeddings for this step's
    # scheduled image tokens + per-token buffer row (-1 = text).
    mm_buffer: Optional[jax.Array] = None
    mm_rows: Optional[jax.Array] = None
    # mrope (Qwen2-VL): [3, T] t/h/w position rows for this step's
    # ragged token stream (None for non-mrope models).
    positions3: Optional[jax.Array] = None
    # Async scheduling: [T] request-row index for tokens whose value is
    # only known on device (the previous step's sample; -1 = known),
    # plus that previous step's [R] samples. None in sync mode.
    feedback_src: Optional[jax.Array] = None
    prev_sampled: Optional[jax.Array] = None
    # prompt_logprobs: [T] next-prompt-token id per row (0 where
    # unused); drives the in-step full-stream logprob gather.
    plp_targets: Optional[jax.Array] = None


class StepHandle(NamedTuple):
    """In-flight device step (launch_step -> finish_step). ``result``
    short-circuits finish for host-computed steps (empty / multi-step
    horizons)."""
    out: SchedulerOutput
    result: Optional[ModelRunnerOutput] = None
    req_ids: list = None
    emits: list = None
    q_blk: int = 0
    inputs: Optional[StepInputs] = None
    sampled: Optional[jax.Array] = None
    spec_mats: Optional[tuple] = None
    lp: Optional[tuple] = None
    hidden: Optional[jax.Array] = None
    pool: Optional[tuple] = None
    want_pooling: bool = False
    np_logits_indices: Optional[np.ndarray] = None
    plp: Optional[tuple] = None  # (vals [T,k], ids [T,k], tgt [T])
    spans: Optional[list] = None  # (req_id, t0, start, n) per request
    ms_samples: Optional[jax.Array] = None  # multi-step [h, R] device


class TPUModelRunner:

    def __init__(
        self,
        config: EngineConfig,
        params: dict,
        num_kv_blocks: int,
        mesh=None,
    ) -> None:
        self.config = config
        self.mesh = mesh
        # Ambient mesh for deep compute paths (EP shard_map; see
        # parallel/mesh.get_current_mesh). Must precede prepare_weights
        # so the repack can see the ep axis size.
        from vllm_tpu.parallel.mesh import set_current_mesh
        set_current_mesh(mesh)
        # Backend-specific weight repack (tile-major W4A16 layout for
        # contiguous streaming; analog of process_weights_after_loading).
        from vllm_tpu.quant.kernels import prepare_weights
        self.params = params = prepare_weights(params)
        mc = config.model
        self.model = get_model(mc.architecture)
        from vllm_tpu.parallel.mesh import AXIS_PP
        self.pp_size = mesh.shape[AXIS_PP] if mesh is not None else 1
        if self.pp_size > 1:
            # GPipe-style microbatch pipeline over the pp axis
            # (parallel/pipeline.py); the wrapper keeps the model
            # forward/compute_logits/make_caches contract.
            from vllm_tpu.parallel.pipeline import PipelinedModel
            self.model = PipelinedModel(
                self.model, mesh, self.pp_size,
                config.parallel.pipeline_microbatch_factor)
        self.max_num_reqs = config.scheduler.max_num_seqs
        self.max_blocks_per_req = config.max_blocks_per_req
        self.block_size = config.cache.block_size
        self.max_tokens_bucket = padded_bucket(
            config.scheduler.max_num_batched_tokens)

        self.batch = InputBatch(self.max_num_reqs, self.max_blocks_per_req,
                                config.seed)
        # mrope (Qwen2-VL): prefill passes [3, T] positions, decode
        # shifts positions by the per-request mrope delta.
        self.is_mrope = bool(mc.rope_scaling
                             and "mrope_section" in mc.rope_scaling)

        # Multi-LoRA runtime (set via set_lora_registry).
        self.lora_registry = None

        # KV offload tier + disagg P/D payloads (engine wires the pool;
        # see core/kv_offload.py).
        self.host_kv_pool = None
        self.kv_payloads: dict[str, object] = {}
        self._last_spans = None

        # Pipelined multi-step decode: device-side token carry between
        # horizon launches (req_id -> position the carry token feeds).
        self._ms_next: dict[str, int] = {}
        self._ms_carry = None  # [R] device tokens (final scan carry)
        self.ms_carry_hits = 0

        # Encoder cache store (scheduler does the budget bookkeeping,
        # core/encoder_cache.py): image hash -> embedding rows [P, E].
        # vision_tower_calls counts actual encoder invocations (tests
        # assert shared images encode once).
        self.encoder_store: dict[str, np.ndarray] = {}
        self.vision_tower_calls = 0

        # Speculative decoding: ngram (host drafter) or EAGLE (device
        # draft model; install via set_eagle_proposer). Verification is
        # shared (greedy-match / stochastic rejection in _step_impl).
        sc = config.speculative
        self.spec_k = (sc.num_speculative_tokens if sc.method
                       in ("ngram", "suffix", "eagle", "eagle3", "mtp",
                           "medusa", "draft_model") else 0)
        self.proposer = None
        self.eagle = None
        # Draft distributions from the last proposal ([max_R, K, V], or
        # None): EAGLE/MTP drafters that share the target LM head emit
        # them for p/q rejection (ref: rejection_sampler draft-probs
        # branch); point-mass drafters leave this None.
        self._draft_probs = None
        # static want_hidden for _step_impl: True streams the final
        # hidden states to the drafter; an aux-layer tuple streams the
        # EAGLE-3 concatenated taps instead.
        self._want_hidden: bool | tuple = False
        if sc.method == "ngram":
            from vllm_tpu.spec_decode.ngram import NgramProposer
            self.proposer = NgramProposer(sc)
        elif sc.method == "suffix":
            from vllm_tpu.spec_decode.suffix import SuffixProposer
            self.proposer = SuffixProposer(sc)
        # Dynamic spec: dense batch_size -> K cap (0 disables drafting
        # at that size; ref: vllm/v1/spec_decode/dynamic/utils.py).
        self._dyn_k: list[int] | None = None
        if self.spec_k and sc.num_speculative_tokens_per_batch_size:
            from vllm_tpu.spec_decode.dynamic import build_lookup
            self._dyn_k = build_lookup(
                sc.num_speculative_tokens_per_batch_size,
                config.scheduler.max_num_seqs, self.spec_k)
        self.num_kv_blocks = num_kv_blocks
        # EPLB: physical expert replicas + host load balancer
        # (parallel/eplb.py). Runs BEFORE sharding so the stacks the
        # mesh shards are already physical [e_phys, ...] — e_phys (not
        # the logical count) is what must divide ep, which is what
        # lets elastic EP pick any world size via redundant top-up.
        self.eplb = None
        if config.parallel.enable_eplb:
            self._init_eplb()
        kv_sh = None
        if mesh is not None and self.pp_size > 1:
            from vllm_tpu.parallel.pipeline import shard_pipeline_params
            self.params = params = shard_pipeline_params(
                params, mc, mesh, self.pp_size)
        elif mesh is not None:
            # Shard weights + KV over the mesh; XLA inserts the TP
            # collectives from these annotations (see parallel/shard.py).
            from vllm_tpu.parallel.shard import (kv_cache_sharding,
                                                 shard_params)
            self.params = params = shard_params(params, mc, mesh)
            kv_sh = kv_cache_sharding(mc, mesh)
        self._kv_sharding = kv_sh
        self._alloc_kv_caches()

        from vllm_tpu import envs
        xla_opts = envs.VLLM_TPU_XLA_OPTS
        if xla_opts is None and jax.default_backend() not in ("cpu", ):
            # Measured on v5e (bench.py 8B INT4 bs32): raising Mosaic's
            # scoped-VMEM share keeps XLA's memory-space assignment from
            # staging whole weight tensors into VMEM ahead of the Pallas
            # calls — the kernels stream HBM themselves, and the staging
            # copies serialized with kernel starts (3,723 -> 3,879
            # tok/s at 112MB vs the 64MB default).
            xla_opts = {"xla_tpu_scoped_vmem_limit_kib": "114688"}
        self._uses_seg_hint = getattr(self.model, "USES_SEG_HINT",
                                      False)
        self._step_fn = jax.jit(
            functools.partial(_step_impl, self.model, mc),
            donate_argnums=(1, ),
            # q_blk, spec_k, n_logprobs, want_hidden, want_pooling,
            # n_plp (prompt-logprobs bucket), seg_hint (mamba chunked
            # prefill certificate; constant True for attention models)
            static_argnums=(3, 4, 5, 6, 7, 8, 9),
            compiler_options=xla_opts,
        )
        self._decode_loop_fn = jax.jit(
            functools.partial(_decode_loop_impl, self.model, mc,
                              self.block_size),
            donate_argnums=(1, ),
            static_argnums=(3, ),  # horizon
            compiler_options=xla_opts,
        )
        # Single-dispatch multi-step launch: ONE packed i32 upload
        # (scalars + block tables), ONE executable that unpacks,
        # selects the device carry, runs the horizon scan and advances
        # the RNG steps — the previous path's ~10 tiny eager device
        # ops per launch each cost a round trip through the remote
        # tunnel (measured as most of the 0.85 ms/step host tail).
        self._decode_launch_fn = jax.jit(
            functools.partial(_decode_launch_impl, self.model, mc,
                              self.block_size),
            donate_argnums=(1, ),
            static_argnums=(8, ),  # horizon
            compiler_options=xla_opts,
        )

    def _alloc_kv_caches(self) -> None:
        mc = self.config.model
        kv_sh = self._kv_sharding
        num_kv_blocks = self.num_kv_blocks
        if hasattr(self.model, "make_caches"):
            # Model-defined cache layout (SSM state caches, hybrid
            # attention+mamba lists — ref analog: the KV-cache spec
            # hierarchy, vllm/v1/kv_cache_interface.py).
            self.kv_caches = self.model.make_caches(
                mc, num_kv_blocks, self.block_size, self.max_num_reqs,
                self.config.cache, kv_sharding=kv_sh)
        else:
            self.kv_caches = [
                make_kv_cache(num_kv_blocks, self.block_size,
                              mc.num_kv_heads, mc.head_dim,
                              self.config.cache.cache_dtype, mc.dtype,
                              sharding=kv_sh)
                for _ in range(mc.num_layers)
            ]
            shape = kv_cache_shape(num_kv_blocks, self.block_size,
                                   mc.num_kv_heads, mc.head_dim)
            logger.info(
                "KV cache: %d layers x %s %s (%.1f MiB total)",
                mc.num_layers, shape,
                kv_cache_jnp_dtype(self.config.cache.cache_dtype,
                                   mc.dtype),
                mc.num_layers * kv_cache_bytes_per_block(
                    self.block_size, mc.num_kv_heads, mc.head_dim,
                    self.config.cache.cache_dtype, mc.dtype) *
                num_kv_blocks / 2**20)

    def reset_state(self) -> None:
        """Fault-recovery device reset (ref analog: WorkerSentinel
        cleanup + rejoin, sentinel/gpu_worker_sentinel.py): drop the
        persistent batch and reallocate fresh KV caches, keeping
        loaded weights and compiled programs."""
        self.batch = InputBatch(self.max_num_reqs,
                                self.max_blocks_per_req,
                                self.config.seed)
        self._ms_next = {}
        self._ms_carry = None
        self._dec_cache_ver = None
        self.kv_payloads.clear()
        self.encoder_store.clear()
        self.kv_caches = None  # release before reallocating
        self._alloc_kv_caches()

    # -- EPLB ----------------------------------------------------------
    def _init_eplb(self) -> None:
        """Convert logical expert stacks to physical replica stacks and
        install per-layer ``eplb`` map leaves (ref analog: EplbState
        construction + the initial even replica spread,
        vllm/distributed/eplb/eplb_state.py)."""
        import numpy as np
        from vllm_tpu.parallel.eplb import (EplbState, rebalance_placement,
                                            set_active_state)
        from vllm_tpu.parallel.mesh import AXIS_EP, axis_size
        pc, mc = self.config.parallel, self.config.model
        E = mc.num_experts
        assert E, "enable_eplb needs a MoE model"
        ep = axis_size(AXIS_EP)
        e_phys = E + pc.num_redundant_experts
        if ep > 1 and e_phys % ep != 0:
            raise ValueError(
                f"num_experts + num_redundant_experts = {e_phys} must "
                f"divide expert_parallel_size = {ep}")
        moe_layers = [i for i, l in enumerate(self.params["layers"])
                      if "w_gate_up" in l]
        # Quantized expert stacks keep the expert axis at 0 in every
        # leaf (qweight [NE, n_n, G, BROWS, bn] + scales/zbias
        # [NE, ...] since the r3 layout), so the replica regather below
        # works uniformly for dense and WNA16 experts at any ep.
        self.eplb = EplbState(num_logical=E, num_layers=mc.num_layers,
                              window=pc.eplb_window,
                              step_interval=pc.eplb_step_interval)
        set_active_state(self.eplb)
        # Initial placement from uniform load: spare replicas spread
        # round-robin, replicas packed evenly on ranks.
        p2l, _ = rebalance_placement(np.ones(E), e_phys, max(ep, 1))
        self._eplb_p2l = {i: p2l for i in moe_layers}
        for i in moe_layers:
            self._install_eplb_placement(i, p2l)

    def _install_eplb_placement(self, layer_idx: int,
                                phys_to_log) -> None:
        """Regather the layer's physical stacks for a new placement and
        refresh its map leaf. Same shapes => value-only update, no
        recompile; under EP the gather moves experts across ranks (XLA
        emits the collective — ref analog: rebalance_execute.py P2P)."""
        import jax.numpy as jnp
        import numpy as np
        from vllm_tpu.parallel.eplb import maps_from_placement
        layer = self.params["layers"][layer_idx]
        E = self.config.model.num_experts
        cur_p2l = self._eplb_p2l[layer_idx]
        first_phys = {}  # logical -> a current physical slot holding it
        for p, e in enumerate(cur_p2l):
            first_phys.setdefault(int(e), p)
        has_maps = "eplb" in layer

        def regather(a):
            if not has_maps:  # first install: stacks are logical
                src = np.asarray(phys_to_log, np.int32)
            else:
                src = np.asarray([first_phys[int(e)] for e in phys_to_log],
                                 np.int32)
            out = jnp.take(a, jnp.asarray(src), axis=0)
            sh = getattr(a, "sharding", None)
            # Pre-shard install (elastic/first boot): no mesh sharding
            # to preserve yet; shard_params picks the layout later.
            return jax.device_put(out, sh) if sh is not None else out

        for key in ("w_gate_up", "w_down"):
            leaf = layer[key]
            layer[key] = (jax.tree.map(regather, leaf)
                          if isinstance(leaf, dict) else regather(leaf))
        l2p, counts = maps_from_placement(np.asarray(phys_to_log), E)
        layer["eplb"] = {
            "log_to_phys": jnp.asarray(l2p, jnp.int32),
            "replica_counts": jnp.asarray(counts, jnp.int32),
            "layer_idx": jnp.asarray(layer_idx, jnp.int32),
        }
        self._eplb_p2l[layer_idx] = np.asarray(phys_to_log)

    def export_logical_params(self) -> dict:
        """Collapse EPLB physical expert stacks back to logical
        ``[E, ...]`` stacks (first replica of each logical expert) and
        drop the map leaves — the weight handoff format for an elastic
        EP rescale (ref analog: the expert rearrangement that precedes
        group reconfiguration, vllm/distributed/elastic_ep/
        elastic_state.py). No-op when EPLB is off: stacks are already
        logical."""
        if self.eplb is None:
            return self.params
        import jax.numpy as jnp
        from vllm_tpu.parallel.eplb import set_active_state
        E = self.config.model.num_experts
        for i, p2l in self._eplb_p2l.items():
            layer = self.params["layers"][i]
            first: dict[int, int] = {}
            for p, e in enumerate(p2l):
                first.setdefault(int(e), p)
            src = jnp.asarray([first[e] for e in range(E)], jnp.int32)

            def tolog(a):
                return jnp.take(a, src, axis=0)

            for key in ("w_gate_up", "w_down"):
                leaf = layer[key]
                layer[key] = (jax.tree.map(tolog, leaf)
                              if isinstance(leaf, dict) else tolog(leaf))
            layer.pop("eplb", None)
        set_active_state(None)
        self.eplb = None
        self._eplb_p2l = {}
        return self.params

    def maybe_rebalance_eplb(self) -> None:
        """Engine-step hook: every eplb_step_interval steps recompute
        per-layer placements from the load EMA and regather."""
        import numpy as np
        from vllm_tpu.parallel.eplb import rebalance_placement
        from vllm_tpu.parallel.mesh import AXIS_EP, axis_size
        if self.eplb is None or not self.eplb.should_rebalance():
            return
        ep = max(axis_size(AXIS_EP), 1)
        E = self.config.model.num_experts
        e_phys = E + self.config.parallel.num_redundant_experts
        for i in list(self._eplb_p2l):
            load = self.eplb.ema[i]
            if not load.any():
                continue
            p2l, _ = rebalance_placement(load, e_phys, ep)
            if not np.array_equal(p2l, self._eplb_p2l[i]):
                self._install_eplb_placement(i, p2l)
        self.eplb.rebalances += 1

    def set_eagle_proposer(self, draft_params: dict, dcfg=None,
                           method: str = "eagle") -> None:
        """Install the EAGLE/EAGLE-3/MTP drafter (ref analog: the
        drafter built in GPUModelRunner.__init__ when
        speculative_config.use_eagle)."""
        from vllm_tpu.spec_decode.eagle import (EagleProposer,
                                                default_aux_layers,
                                                draft_config_from_target)
        mc = self.config.model
        sc = self.config.speculative
        # Aux-tap priority: explicit config override > checkpoint
        # config.json (stashed by load_eagle3_params) > (2, N//2, N-3)
        # default (ref: gpu_model_runner.py:5545).
        ckpt_aux = draft_params.pop("_aux_layers", None)
        if dcfg is None:
            dcfg = draft_config_from_target(mc, sc.draft_num_layers)
        self.eagle = EagleProposer(draft_params, dcfg, self.spec_k,
                                   self.num_kv_blocks, self.block_size,
                                   self.config.cache.cache_dtype,
                                   method=method)
        if method == "eagle3":
            aux = (tuple(sc.eagle_aux_layers) if sc.eagle_aux_layers
                   else ckpt_aux or default_aux_layers(mc))
            self._want_hidden = tuple(sorted(aux))
        else:
            self._want_hidden = True

    def set_medusa_proposer(self, draft_params: dict) -> None:
        """Install Medusa heads (ref analog: MedusaProposer built in
        gpu_model_runner when method == 'medusa'). Drives the same
        device-drafter path as EAGLE; reads only the final hidden
        states at the accepted positions."""
        from vllm_tpu.spec_decode.medusa import MedusaProposer
        self.eagle = MedusaProposer(draft_params, self.spec_k)
        self._want_hidden = True

    def set_draft_model_proposer(self, draft_params: dict,
                                 dcfg) -> None:
        """Install an independent draft causal LM (ref analog:
        DraftModelProposer, vllm/v1/spec_decode/draft_model.py:19).
        Token-only drafting — no hidden-state streaming needed."""
        from vllm_tpu.spec_decode.draft_model import DraftModelProposer
        self.eagle = DraftModelProposer(draft_params, dcfg,
                                        self.config.model, self.spec_k,
                                        self.num_kv_blocks,
                                        self.block_size,
                                        self.config.cache.cache_dtype)

    def set_lora_registry(self, registry) -> None:
        """Install/refresh the multi-LoRA stacks. The stacked adapter
        tensors ride inside the params pytree (params["lora"]) so both
        jitted programs see them without signature changes; adding or
        changing adapters recompiles once (new pytree structure)."""
        self.lora_registry = registry
        base = {k: v for k, v in self.params.items() if k != "lora"}
        if registry is not None and registry.enabled:
            stacks = registry.stacks(base)
            per_layer = [dict() for _ in range(self.config.model.num_layers)]
            for (li, leaf), stack in stacks.items():
                per_layer[li][leaf] = stack
            base["lora"] = per_layer
        self.params = base

    # -- state sync ---------------------------------------------------
    def update_states(self, out: SchedulerOutput) -> None:
        """Apply the scheduler's diffs to the persistent batch
        (ref analog: gpu_model_runner._update_states:1233)."""
        for h in out.encoder_evict:
            self.encoder_store.pop(h, None)
        for req_id in out.finished_req_ids:
            self.batch.remove_request(req_id)
            self.kv_payloads.pop(req_id, None)
        for req_id in out.preempted_req_ids:
            self.batch.remove_request(req_id)
        for nr in out.scheduled_new_reqs:
            lora_slot = 0
            if self.lora_registry is not None:
                lora_slot = self.lora_registry.slot_of(
                    getattr(nr, "lora_name", None))
            state = self.batch.add_request(nr.req_id, nr.prompt_token_ids,
                                           nr.block_ids,
                                           nr.num_computed_tokens,
                                           nr.sampling_params,
                                           lora_slot=lora_slot)
            grammar = getattr(nr.sampling_params, "_grammar", None)
            if grammar is not None:
                from vllm_tpu.structured_output.trie import GrammarState
                state.grammar = GrammarState(grammar)
            if getattr(nr, "pooling_params", None) is not None:
                state.pooling = nr.pooling_params
                state.pool_sum = None  # accumulated over prefill chunks
            if getattr(nr, "mm_data", None) is not None:
                self._install_mm(state, nr)
        for cr in out.scheduled_cached_reqs:
            state = self.batch.reqs[cr.req_id]
            if cr.new_block_ids:
                self.batch.append_block_ids(cr.req_id, cr.new_block_ids)
            state.num_computed_tokens = cr.num_computed_tokens
            # Extend the host token list with newly sampled/known tokens.
            known = len(state.token_ids)
            need = cr.num_computed_tokens + len(cr.new_token_ids)
            if need > known:
                state.token_ids.extend(cr.new_token_ids[known -
                                                        cr.num_computed_tokens:])
            # Async scheduling: positions scheduled past the known
            # tokens get -1 placeholders; prepare_inputs routes them to
            # device-side feedback and finish() backfills the value.
            # (Sync spec steps also schedule past num_tokens, but their
            # drafts ride scheduled_spec_decode_tokens, not this list.)
            short = 0
            if self.config.scheduler.async_scheduling:
                short = (cr.num_computed_tokens +
                         out.num_scheduled_tokens[cr.req_id] -
                         len(state.token_ids))
            if short > 0:
                state.token_ids.extend([-1] * short)
                state.num_placeholders = (getattr(
                    state, "num_placeholders", 0) + short)

    # -- input prep ---------------------------------------------------
    def prepare_inputs(
            self,
            out: SchedulerOutput
    ) -> tuple[StepInputs, list[str], list[bool], int]:
        R = self.max_num_reqs
        # Scheduled requests in row order (flat ragged stream must be
        # row-ascending for query_start_loc).
        sched = sorted(out.num_scheduled_tokens.items(),
                       key=lambda kv: self.batch.reqs[kv[0]].row)
        T = out.total_num_scheduled_tokens
        # Attention query-window rows (static): small window for
        # decode-dominated steps, large for prefill chunks. The token
        # buffer carries q_blk rows of slack (the kernel DMAs whole
        # windows; see ops/pallas/ragged_attention.py output contract).
        max_q = max(out.num_scheduled_tokens.values())
        q_blk = 16 if max_q <= 16 else 128
        # Bucket ladder capped at max_batched + slack: the top rung is
        # exact, not the next power of two (a 2048-budget prefill must
        # not pay for a 4096-token program).
        cap = self.max_tokens_bucket + 128
        T_pad = min(padded_bucket(T + q_blk), cap)

        K = self.spec_k
        has_lora = (self.lora_registry is not None
                    and self.lora_registry.enabled)
        lora_idx = np.zeros((T_pad, ), np.int32) if has_lora else None
        input_ids = np.zeros((T_pad, ), np.int32)
        positions = np.zeros((T_pad, ), np.int32)
        slot_mapping = np.zeros((T_pad, ), np.int32)
        qsl = np.zeros((R + 1, ), np.int32)
        seq_lens = np.zeros((R, ), np.int32)
        logits_indices = np.zeros((R, K + 1), np.int32)
        draft_targets = np.full((R, K + 1), -1, np.int32)

        req_ids: list[str] = []
        emits: list[bool] = []
        spans: list[tuple[str, int, int, int]] = []  # (id, t0, start, n)
        feedback_src = None  # async: rows feeding tokens from device
        t = 0
        prev_row = -1
        for req_id, n in sched:
            state = self.batch.reqs[req_id]
            row = state.row
            drafts = out.scheduled_spec_decode_tokens.get(req_id, [])
            real_n = n - len(drafts)
            # Rows between prev_row and row have zero-length queries.
            qsl[prev_row + 2:row + 1] = t
            start = state.num_computed_tokens
            toks = state.token_ids[start:start + real_n] + list(drafts)
            assert len(toks) == n, (
                f"{req_id}: host tokens {len(state.token_ids)} < "
                f"{start + real_n}")
            input_ids[t:t + n] = toks
            if -1 in toks:
                # Async placeholder: value = prev step's sample for
                # this row, substituted on device (_step_impl).
                if feedback_src is None:
                    feedback_src = np.full((T_pad, ), -1, np.int32)
                for i_, tk in enumerate(toks):
                    if tk < 0:
                        feedback_src[t + i_] = row
            if lora_idx is not None:
                lora_idx[t:t + n] = state.lora_slot
            positions[t:t + n] = np.arange(start, start + n)
            for i in range(n):
                pos = start + i
                slot_mapping[t + i] = (
                    state.block_ids[pos // self.block_size] *
                    self.block_size + pos % self.block_size)
            seq_lens[row] = start + n
            # Last K+1 scheduled positions (clamped to row start):
            # column K is always the final token; for a verification
            # step the last len(drafts)+1 columns cover [t0, d1..dk].
            for j in range(K + 1):
                logits_indices[row, j] = t + max(n - 1 - (K - j), 0)
            # Column K-d+j predicts after consuming the j-th
            # verification input, so draft j is judged there.
            for j, d_tok in enumerate(drafts):
                draft_targets[row, K - len(drafts) + j] = d_tok
            spans.append((req_id, t, start, n))
            t += n
            qsl[row + 1] = t
            prev_row = row
            req_ids.append(req_id)
            emits.append(start + real_n >= len(state.token_ids))
        qsl[prev_row + 2:] = t
        mm_buffer, mm_rows = self._build_mm(spans, T_pad)

        positions3 = None
        if self.is_mrope:
            # Per-token t/h/w rows: in-prompt tokens read the request's
            # precomputed mrope grid; generated tokens are 1-D at
            # position + delta (ref analog: MRotaryEmbedding
            # get_input_positions / get_next_input_positions).
            positions3 = np.broadcast_to(positions, (3, T_pad)).copy()
            for req_id, t0, start, n in spans:
                state = self.batch.reqs[req_id]
                pos3 = getattr(state, "mrope_pos3", None)
                delta = getattr(state, "mrope_delta", 0)
                ep = 0
                if pos3 is not None:
                    ep = min(n, max(0, pos3.shape[1] - start))
                    if ep > 0:
                        positions3[:, t0:t0 + ep] = pos3[:,
                                                         start:start + ep]
                if delta and ep < n:
                    positions3[:, t0 + ep:t0 + n] += delta

        # prompt_logprobs (ref: vllm prompt_logprobs): target ids for
        # the in-step full-stream logprob gather — row t scores prompt
        # position start+i+1, whose token the host already knows.
        plp_targets = None
        if any(self.batch.reqs[r].sampling_params.prompt_logprobs
               for r in req_ids):
            plp_targets = np.zeros((T_pad, ), np.int32)
            for req_id, t0, start, n in spans:
                st = self.batch.reqs[req_id]
                if not st.sampling_params.prompt_logprobs:
                    continue
                toks = st.token_ids
                for i in range(n):
                    p_next = start + i + 1
                    if p_next < st.prompt_len:
                        plp_targets[t0 + i] = toks[p_next]
        self._last_spans = spans

        b = self.batch
        # Host copy for EAGLE's accepted-position arithmetic.
        self._np_logits_indices = logits_indices
        # NOTE: batch-owned arrays are snapshotted with .copy() before
        # jnp.asarray everywhere in this file — device_put is
        # asynchronous, and the batch mutates these buffers in place
        # (bump_sample_step, update_states) while the deferred H2D copy
        # may still be pending; the race flipped EAGLE's sampled-draft
        # RNG stream nondeterministically.
        sampling = SamplingMetadata(
            temperature=jnp.asarray(b.temperature.copy()),
            top_k=jnp.asarray(b.top_k.copy()),
            top_p=jnp.asarray(b.top_p.copy()),
            min_p=jnp.asarray(b.min_p.copy()),
            seeds=jnp.asarray(b.seeds.copy()),
            steps=jnp.asarray(b.sample_steps.copy()),
        )
        inputs = StepInputs(
            input_ids=jnp.asarray(input_ids),
            positions=jnp.asarray(positions),
            slot_mapping=jnp.asarray(slot_mapping),
            block_tables=jnp.asarray(b.block_tables.copy()),
            query_start_loc=jnp.asarray(qsl),
            seq_lens=jnp.asarray(seq_lens),
            logits_indices=jnp.asarray(logits_indices),
            sampling=sampling,
            penalties=self._build_penalties(req_ids),
            grammar_mask=self._build_grammar_mask(req_ids),
            draft_targets=(jnp.asarray(draft_targets)
                           if K > 0 else None),
            draft_probs=(self._draft_probs if K > 0 else None),
            lora_idx=(jnp.asarray(lora_idx)
                      if lora_idx is not None else None),
            mm_buffer=mm_buffer,
            mm_rows=mm_rows,
            positions3=(jnp.asarray(positions3)
                        if positions3 is not None else None),
            feedback_src=(jnp.asarray(feedback_src)
                          if feedback_src is not None else None),
            prev_sampled=(self._last_sampled
                          if feedback_src is not None else None),
            plp_targets=(jnp.asarray(plp_targets)
                         if plp_targets is not None else None),
        )
        if feedback_src is not None and self._last_sampled is None:
            raise RuntimeError(
                "async placeholder scheduled with no in-flight samples")
        return inputs, req_ids, emits, q_blk

    # -- multimodal ----------------------------------------------------
    def _install_mm(self, state, nr) -> None:
        """Assemble the request's patch embeddings, running the vision
        tower only for encoder-cache misses (ref analog: scheduled
        encoder inputs vs cached, encoder_cache_manager.py). Hashed
        entries live in ``self.encoder_store``; the scheduler's budget
        bookkeeping decides lifetime (mm_encode_hashes/encoder_evict).
        Also precomputes the prompt-position -> patch-row map."""
        import functools as _ft
        mc = self.config.model
        hashes = getattr(nr, "mm_item_hashes", None)
        if getattr(self.model, "IS_ENCODER_DECODER", False):
            # Whisper-class: run the audio encoder + cross-KV
            # projection once (the audio analog of the vision tower)
            # and scatter the slabs into this request's row
            # (models/whisper.py serving design).
            from vllm_tpu.models import whisper
            if not hasattr(self, "_audio_encode"):
                self._audio_encode = jax.jit(
                    _ft.partial(whisper.encode_cross_kv, self.params,
                                mc))
            h = hashes[0] if hashes else None
            if h is not None and h in self.encoder_store:
                ks, vs = self.encoder_store[h]
            else:
                self.vision_tower_calls += 1
                ks, vs = self._audio_encode(
                    jnp.asarray(np.asarray(nr.mm_data["audio"])))
                if h is not None:
                    self.encoder_store[h] = (ks, vs)
            row = state.row
            self.kv_caches = [
                (paged, _set_cache_row(ck, row, ks[i]),
                 _set_cache_row(cv, row, vs[i]))
                for i, (paged, ck, cv) in enumerate(self.kv_caches)
            ]
            return
        if self.is_mrope:
            # Qwen2-VL: grid-shaped patches + mrope position grid.
            from vllm_tpu.models import qwen2_vl
            grids = [tuple(int(x) for x in g)
                     for g in nr.mm_data["image_grid_thw"]]
            if hashes is None:  # no cache accounting: encode all
                self.vision_tower_calls += 1
                state.mm_embeds = qwen2_vl.encode_images(
                    self.params, mc, jnp.asarray(nr.mm_data["image"]),
                    grids)
            else:
                fn = qwen2_vl._encode_one(mc)
                pixels = nr.mm_data["image"]
                per_item, off = [], 0
                for h, g in zip(hashes, grids):
                    s = g[0] * g[1] * g[2]
                    if h not in self.encoder_store:
                        self.vision_tower_calls += 1
                        self.encoder_store[h] = np.asarray(
                            fn(self.params,
                               jnp.asarray(pixels[off:off + s]), g))
                    per_item.append(self.encoder_store[h])
                    off += s
                state.mm_embeds = jnp.asarray(
                    np.concatenate(per_item, axis=0))
            pos3, delta = qwen2_vl.mrope_positions(
                nr.prompt_token_ids, grids, mc)
            state.mrope_pos3 = pos3
            state.mrope_delta = delta
            self.batch.mrope_delta[state.row] = delta
            self.batch.version += 1
        else:
            from vllm_tpu.models import llava
            if not hasattr(self, "_mm_encode"):
                self._mm_encode = jax.jit(
                    _ft.partial(llava.encode_images, self.params, mc))
            imgs = np.asarray(nr.mm_data["image"])
            if hashes is None:
                self.vision_tower_calls += 1
                embeds = self._mm_encode(jnp.asarray(imgs))  # [N, P, E]
                state.mm_embeds = embeds.reshape(-1, embeds.shape[-1])
            else:
                miss = [i for i, h in enumerate(hashes)
                        if h not in self.encoder_store]
                if miss:
                    self.vision_tower_calls += 1
                    got = np.asarray(
                        self._mm_encode(jnp.asarray(imgs[miss])))
                    for j, i in enumerate(miss):
                        self.encoder_store[hashes[i]] = got[j]
                state.mm_embeds = jnp.asarray(np.concatenate(
                    [self.encoder_store[h] for h in hashes], axis=0))
        tok = mc.image_token_index
        idx = np.full(len(nr.prompt_token_ids), -1, np.int32)
        c = 0
        for i, t in enumerate(nr.prompt_token_ids):
            if t == tok:
                idx[i] = c
                c += 1
        state.mm_index = idx

    def _build_mm(self, spans, T_pad):
        """(mm_buffer [Pbuf, E], mm_rows [T_pad]) for this step, or
        (None, None) when no scheduled token is an image patch."""
        mm_rows = np.full((T_pad, ), -1, np.int32)
        buffers = []
        offset = 0
        any_row = False
        for req_id, t0, start, n in spans:
            state = self.batch.reqs[req_id]
            embeds = getattr(state, "mm_embeds", None)
            if embeds is None or start >= len(state.mm_index):
                continue
            used = False
            for i in range(min(n, len(state.mm_index) - start)):
                mi = state.mm_index[start + i]
                if mi >= 0:
                    mm_rows[t0 + i] = offset + mi
                    used = any_row = True
            if used:
                buffers.append(embeds)
                offset += embeds.shape[0]
        if not any_row:
            return None, None
        buf = jnp.concatenate(buffers, axis=0)
        pad_to = padded_bucket(buf.shape[0])
        if pad_to > buf.shape[0]:
            buf = jnp.pad(buf, ((0, pad_to - buf.shape[0]), (0, 0)))
        return buf, jnp.asarray(mm_rows)

    # -- KV block transfer (offload tier + disagg P/D) -----------------
    def read_blocks(self, block_ids: list[int]):
        """Gather block contents across layers: (datas, scales) — per
        layer [n, 2KH, bs, Dp] numpy (scales None for float caches)."""
        from vllm_tpu.ops.kv_cache import QuantKV
        idx = jnp.asarray(block_ids, jnp.int32)
        datas, scales = [], []
        for c in self.kv_caches:
            if isinstance(c, QuantKV):
                datas.append(np.asarray(jax.device_get(c.data[idx])))
                scales.append(np.asarray(jax.device_get(c.scales[idx])))
            else:
                datas.append(np.asarray(jax.device_get(c[idx])))
                scales.append(None)
        return datas, scales

    def write_blocks(self, block_ids: list[int], datas, scales) -> None:
        """Scatter block contents into the caches (donated in-place
        update; ids padded to a bucket with the null block so the
        program set stays small — null-block writes are scratch)."""
        from vllm_tpu.ops.kv_cache import QuantKV
        n = len(block_ids)
        n_pad = padded_bucket(n)
        ids = np.zeros((n_pad, ), np.int32)
        ids[:n] = block_ids
        idx = jnp.asarray(ids)

        def pad(a):
            return jnp.asarray(
                np.concatenate(
                    [a, np.zeros((n_pad - n, ) + a.shape[1:], a.dtype)])
                if n_pad > n else a)

        for i, c in enumerate(self.kv_caches):
            if isinstance(c, QuantKV):
                self.kv_caches[i] = QuantKV(
                    _scatter_blocks(c.data, idx, pad(datas[i])),
                    _scatter_blocks(c.scales, idx, pad(scales[i])),
                    c.codebook)
            else:
                self.kv_caches[i] = _scatter_blocks(
                    c, idx, pad(datas[i]).astype(c.dtype))

    def _process_kv_transfers(self, out: SchedulerOutput) -> None:
        """Execute the scheduler's KV-movement plan BEFORE the forward
        (offloaded blocks are about to be overwritten)."""
        if out.offload_blocks and self.host_kv_pool is not None:
            datas, scales = self.read_blocks(
                [bid for bid, _ in out.offload_blocks])
            for j, (bid, h) in enumerate(out.offload_blocks):
                d = np.stack([ld[j] for ld in datas])
                s = (np.stack([ls[j] for ls in scales])
                     if scales[0] is not None else None)
                self.host_kv_pool.store(h, d, s)
        if out.swap_in_blocks and self.host_kv_pool is not None:
            ids, datas, scales = [], [], []
            for h, bid in out.swap_in_blocks:
                entry = self.host_kv_pool.get(h)
                assert entry is not None, "host tier lost a block"
                ids.append(bid)
                datas.append(entry[0])
                scales.append(entry[1])
            L = datas[0].shape[0]
            per_layer = [np.stack([d[l] for d in datas]) for l in range(L)]
            per_layer_s = ([np.stack([s[l] for s in scales])
                            for l in range(L)]
                           if scales[0] is not None else [None] * L)
            self.write_blocks(ids, per_layer, per_layer_s)
        for req_id in out.kv_inject_reqs:
            payload = self.kv_payloads.get(req_id)
            if payload is None:
                continue
            nr = next(r for r in out.scheduled_new_reqs
                      if r.req_id == req_id)
            nblk = payload.data[0].shape[0]
            ids = nr.block_ids[:nblk]
            self.write_blocks(ids, payload.data, payload.scales or
                              [None] * len(payload.data))

    def _accumulate_pooling(self, state, out, pool_np, req_id) -> None:
        sums, firsts, lasts = pool_np
        row = state.row
        n = out.num_scheduled_tokens[req_id]
        start = state.num_computed_tokens
        if state.pool_sum is None:
            state.pool_sum = np.zeros_like(sums[row])
            state.pool_count = 0
        state.pool_sum = state.pool_sum + sums[row]
        state.pool_count += n
        if start == 0:
            state.pool_first = firsts[row].copy()
        state.pool_last = lasts[row].copy()

    def _finalize_pooling(self, state) -> list[float]:
        pp = state.pooling
        if pp.pooling_type == "mean":
            vec = state.pool_sum / max(state.pool_count, 1)
        elif pp.pooling_type == "cls":
            vec = state.pool_first
        else:  # last
            vec = state.pool_last
        vec = np.asarray(vec, np.float32)
        if pp.dimensions:
            vec = vec[:pp.dimensions]
        if pp.normalize:
            vec = vec / max(float(np.linalg.norm(vec)), 1e-12)
        return [float(v) for v in vec]

    def _build_grammar_mask(self, req_ids) -> Optional[jax.Array]:
        states = [(r, getattr(self.batch.reqs[r], "grammar", None))
                  for r in req_ids]
        if not any(g is not None and g.active for _, g in states):
            return None
        R = self.max_num_reqs
        V = self.config.model.vocab_size
        W = (V + 31) // 32
        packed = np.full((R, W), 0xFFFFFFFF, np.uint32)
        for r, g in states:
            if g is not None and g.active:
                row = self.batch.reqs[r].row
                packed[row] = g.allowed_mask_packed(V)
        return jnp.asarray(packed)

    def _build_penalties(self, req_ids) -> Optional[PenaltyInputs]:
        """[R, V] token statistics, only when some scheduled request
        uses penalties (ref: vllm penalties bin-count tensors)."""
        need = any(self.batch.reqs[r].sampling_params.has_penalties
                   for r in req_ids)
        if not need:
            return None
        R = self.max_num_reqs
        V = self.config.model.vocab_size
        rep = np.ones((R, ), np.float32)
        pres = np.zeros((R, ), np.float32)
        freq = np.zeros((R, ), np.float32)
        out_counts = np.zeros((R, V), np.int32)
        all_presence = np.zeros((R, V), bool)
        bias = np.zeros((R, V), np.float32)
        for r in req_ids:
            st = self.batch.reqs[r]
            sp = st.sampling_params
            rep[st.row] = sp.repetition_penalty
            pres[st.row] = sp.presence_penalty
            freq[st.row] = sp.frequency_penalty
            for tid, b in (sp.logit_bias or {}).items():
                tid = int(tid)
                if 0 <= tid < V:
                    bias[st.row, tid] = float(b)
            toks = np.asarray(st.token_ids)
            # Exclude async -1 placeholders along with >=V specials.
            otoks = toks[st.prompt_len:]
            np.add.at(out_counts[st.row],
                      otoks[(otoks >= 0) & (otoks < V)], 1)
            all_presence[st.row][toks[(toks >= 0) & (toks < V)]] = True
        return PenaltyInputs(jnp.asarray(rep), jnp.asarray(pres),
                             jnp.asarray(freq), jnp.asarray(out_counts),
                             jnp.asarray(all_presence),
                             jnp.asarray(bias))

    # -- execution ----------------------------------------------------
    def execute_model(self, out: SchedulerOutput) -> ModelRunnerOutput:
        return self.finish_step(self.launch_step(out))

    def launch_step(self, out: SchedulerOutput) -> "StepHandle":
        """Apply scheduler diffs and dispatch the device step WITHOUT
        waiting for results (async scheduling overlaps the next
        schedule/prepare with this step's execution — ref analog:
        execute_model(non_block=True) + sample_tokens in core.py)."""
        # Re-install this runner's mesh: several engines (DP ranks) can
        # coexist in-process, and the EP compute path resolves the
        # ambient mesh at trace time.
        from vllm_tpu.parallel.mesh import set_current_mesh
        set_current_mesh(self.mesh)
        self.update_states(out)
        if out.offload_blocks or out.swap_in_blocks or out.kv_inject_reqs:
            self._process_kv_transfers(out)
        if out.total_num_scheduled_tokens == 0:
            return StepHandle(out=out, result=ModelRunnerOutput())
        if out.decode_horizon > 1:
            return self._launch_multi_step(out)
        # Any other program advances requests outside the multi-step
        # carry: invalidate it (the engine falls back to drained
        # launches until the next horizon rebuilds it).
        self._ms_next = {}
        inputs, req_ids, emits, q_blk = self.prepare_inputs(out)
        # Top-logprobs bucket (static): 0 disables the gather.
        n_lp = max((self.batch.reqs[r].sampling_params.logprobs or 0
                    for r in req_ids), default=0)
        n_plp = max(((self.batch.reqs[r].sampling_params.prompt_logprobs
                      or 0) for r in req_ids), default=0)
        if inputs.plp_targets is None:
            n_plp = 0
        want_pooling = any(
            getattr(self.batch.reqs[r], "pooling", None) is not None
            for r in req_ids)
        # Mamba chunked-prefill certificate: stream segments ==
        # scheduled requests + 1 trailing padding segment. Constant
        # True for attention-only models so their program never
        # re-specializes on it.
        seg_hint = (not self._uses_seg_hint
                    or len(out.num_scheduled_tokens) + 1 <= 8)
        (self.kv_caches, sampled, spec_mats, lp, hidden,
         pool, plp) = self._step_fn(self.params, self.kv_caches, inputs,
                                    q_blk, self.spec_k, n_lp,
                                    self._want_hidden, want_pooling,
                                    n_plp, seg_hint)
        self._last_sampled = sampled  # device-side feedback source
        return StepHandle(out=out, req_ids=req_ids, emits=emits,
                          q_blk=q_blk, inputs=inputs, sampled=sampled,
                          spec_mats=spec_mats, lp=lp, hidden=hidden,
                          pool=pool, want_pooling=want_pooling,
                          np_logits_indices=self._np_logits_indices,
                          plp=plp, spans=self._last_spans)

    def finish_step(self, h: "StepHandle") -> ModelRunnerOutput:
        """Block on the device step and run host bookkeeping."""
        if h.result is not None:
            return h.result
        if h.ms_samples is not None:
            return self._finish_multi_step(h)
        out, req_ids, emits = h.out, h.req_ids, h.emits
        inputs, sampled, q_blk = h.inputs, h.sampled, h.q_blk
        spec_mats, lp, hidden, pool = (h.spec_mats, h.lp, h.hidden,
                                       h.pool)
        want_pooling = h.want_pooling
        pool_np = (tuple(map(np.asarray, jax.device_get(pool)))
                   if pool is not None else None)
        sampled_np = np.asarray(jax.device_get(sampled))
        lp_np = jax.device_get(lp) if lp is not None else None
        # prompt_logprobs: fold this step's prompt rows into each
        # request's accumulator; finalized below when its prefill is
        # complete (ref: vllm prompt_logprobs — entry i is the top-k
        # + actual-token logprob at prompt position i; position 0 has
        # no distribution and reports None).
        plp_done: dict[str, list] = {}
        if h.plp is not None:
            vals_np, ids_np, tgt_np2 = map(np.asarray,
                                           jax.device_get(h.plp))
            for req_id, t0, start, n in h.spans or []:
                st = self.batch.reqs.get(req_id)
                if st is None or not st.sampling_params.prompt_logprobs:
                    continue
                k = st.sampling_params.prompt_logprobs
                acc = getattr(st, "prompt_lp", None)
                if acc is None:
                    acc = st.prompt_lp = [None]  # position 0
                for i in range(n):
                    pos_next = start + i + 1
                    if pos_next >= st.prompt_len:
                        break
                    row = t0 + i
                    entry = {int(tid): float(v) for tid, v in
                             zip(ids_np[row, :k], vals_np[row, :k])}
                    entry.setdefault(int(st.token_ids[pos_next]),
                                     float(tgt_np2[row]))
                    acc.append(entry)
                if len(acc) >= st.prompt_len:
                    plp_done[req_id] = acc
        greedy_np = stok_np = snew_np = None
        if spec_mats is not None:
            greedy_np, stok_np, snew_np = map(np.asarray,
                                              jax.device_get(spec_mats))

        result = ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=[])
        if lp_np is not None:
            result.logprobs = []
        if plp_done:
            result.prompt_logprobs = [plp_done.get(r) for r in req_ids]
        spec_out: list[list[int]] = []
        # EAGLE bookkeeping: per-row (accepted count, last token).
        eagle_rows: list[tuple[int, int, int, int]] = []
        K = self.spec_k
        if want_pooling:
            result.pooler_outputs = []
        # Dynamic spec: cap K by the step's batch size (0 disables
        # drafting; ref: vllm/v1/spec_decode/dynamic/utils.py lookup).
        dyn_k = (K if self._dyn_k is None else
                 self._dyn_k[min(len(req_ids), len(self._dyn_k) - 1)])
        for req_id, emit in zip(req_ids, emits):
            state = self.batch.reqs.get(req_id)
            if state is None:
                # Finished/aborted while this step was in flight
                # (async): a later launch already purged the row.
                result.sampled_token_ids.append([])
                spec_out.append([])
                if lp_np is not None:
                    result.logprobs.append([])
                if want_pooling:
                    result.pooler_outputs.append(None)
                continue
            row = state.row
            drafts = out.scheduled_spec_decode_tokens.get(req_id, [])
            if getattr(state, "pooling", None) is not None:
                # Embedding request: accumulate this chunk's pooled
                # stats; finalize when the whole prompt has been seen
                # (ref analog: the pooler path in gpu_model_runner +
                # vllm/model_executor/layers/pooler.py).
                self._accumulate_pooling(state, out, pool_np, req_id)
                result.sampled_token_ids.append([])
                spec_out.append([])
                if lp_np is not None:
                    result.logprobs.append([])
                done = (state.num_computed_tokens +
                        out.num_scheduled_tokens[req_id] >=
                        state.prompt_len)
                result.pooler_outputs.append(
                    self._finalize_pooling(state) if done else None)
                continue
            if want_pooling:
                result.pooler_outputs.append(None)
            if not emit:
                result.sampled_token_ids.append([])
                spec_out.append([])
                if lp_np is not None:
                    result.logprobs.append([])
                continue
            if drafts and state.sampling_params.temperature == 0.0:
                # Greedy verification: column K-d+j is the prediction
                # after consuming the j-th verification input
                # (j=0 -> after t0). Accept drafts while they match.
                d = len(drafts)
                g = greedy_np[row]
                preds = g[K - d:K + 1]  # [d+1]
                new_toks = []
                for j, draft in enumerate(drafts):
                    if int(preds[j]) == draft:
                        new_toks.append(draft)
                    else:
                        break
                new_toks.append(int(preds[len(new_toks)]))
            elif drafts:
                # Stochastic rejection sampling, computed ON DEVICE
                # (sample/sampler.py spec_rejection_outputs): the step
                # program already applied the accept rule (p/q ratio
                # when the drafter emitted distributions, the
                # NO_DRAFT_PROBS u < p_target rule otherwise) and the
                # residual/bonus emission — the host just slices.
                n = int(snew_np[row])
                new_toks = [int(t) for t in stok_np[row, :n]]
            else:
                new_toks = [int(sampled_np[row])]
            result.sampled_token_ids.append(new_toks)
            # Async scheduling: a later launch may have reserved this
            # token's position with a -1 placeholder — fill it in
            # emission order instead of appending.
            ph = getattr(state, "num_placeholders", 0)
            if ph:
                base_i = len(state.token_ids) - ph
                fill = min(ph, len(new_toks))
                for j in range(fill):
                    state.token_ids[base_i + j] = new_toks[j]
                state.num_placeholders = ph - fill
                state.token_ids.extend(new_toks[fill:])
            else:
                state.token_ids.extend(new_toks)
            self.batch.bump_sample_step(req_id)
            g = getattr(state, "grammar", None)
            if g is not None:
                for t in new_toks:
                    g.advance(t)
            if lp_np is not None:
                s_lp, t_ids, t_lp = lp_np
                row_lp = {int(sampled_np[row]): float(s_lp[row])}
                want = state.sampling_params.logprobs or 0
                for tid, tlp in zip(t_ids[row][:want], t_lp[row][:want]):
                    row_lp.setdefault(int(tid), float(tlp))
                result.logprobs.append([row_lp])
            # Propose drafts for the next step (greedy-match or
            # stochastic rejection verification). Skip penalty/grammar/
            # logprobs requests: their verification columns would need
            # per-position token stats / grammar states / logprob
            # alignment, so they stay single-token (their column-K
            # logits remain exact).
            sp = state.sampling_params
            eligible = (not sp.logprobs and g is None
                        and not sp.has_penalties)
            if (self.proposer is not None
                    and getattr(self.proposer, "needs_request_state",
                                False)):
                # Suffix decoding: the cache must see every emitted
                # token in order (a gap would fabricate adjacent
                # n-grams in the global tree), so update even when
                # drafting is disabled this step.
                draft = self.proposer.propose_for(req_id,
                                                  state.token_ids,
                                                  state.prompt_len,
                                                  new_toks)
                spec_out.append(draft[:dyn_k] if eligible else [])
            elif self.proposer is not None and eligible and dyn_k:
                spec_out.append(
                    self.proposer.propose(state.token_ids)[:dyn_k])
            else:
                spec_out.append([])
            if self.eagle is not None and eligible and dyn_k:
                eagle_rows.append((len(spec_out) - 1, row, len(drafts),
                                   len(new_toks)))
        if (self.proposer is not None
                and getattr(self.proposer, "needs_request_state", False)):
            self.proposer.sync_active(req_ids)
        if self.eagle is not None and eagle_rows:
            # One device call drafts for every eligible row (draft
            # prefill over this step's stream + k-1 chained steps).
            R = self.max_num_reqs
            next_tok = np.zeros((R, ), np.int32)
            last_idx = np.zeros((R, ), np.int32)
            active = np.zeros((R, ), bool)
            li = h.np_logits_indices
            row_to_slot: dict[int, int] = {}
            for slot, row, n_drafts, n_new in eagle_rows:
                st = self.batch.reqs[req_ids[slot]]
                next_tok[row] = st.token_ids[-1]
                # Flat index of the last *accepted* position: the last
                # scheduled index minus the rejected draft count.
                last_idx[row] = li[row, K] - n_drafts + (n_new - 1)
                active[row] = True
                row_to_slot[row] = slot
            drafts = self.eagle.propose(self.params, hidden, inputs,
                                        next_tok, last_idx, active,
                                        q_blk)
            # Draft distributions (device array) for next step's p/q
            # rejection; None for point-mass drafters (eagle3/medusa).
            self._draft_probs = getattr(self.eagle, "last_draft_probs",
                                        None)
            for row, slot in row_to_slot.items():
                spec_out[slot] = [int(t) for t in drafts[row][:dyn_k]]
        if self.proposer is not None or self.eagle is not None:
            result.spec_token_ids = spec_out
        return result

    def execute_dummy(self) -> None:
        """Run the forward program on an all-padding batch. DP wave
        lockstep: when EP spans DP ranks, every rank must execute the
        collective program each wave step even with no real tokens
        (ref analog: DP dummy steps, vllm dp_utils.py)."""
        from vllm_tpu.parallel.mesh import set_current_mesh
        set_current_mesh(self.mesh)
        R = self.max_num_reqs
        dec = self._build_decode_inputs(jnp.zeros((R, ), jnp.int32),
                                        jnp.zeros((R, ), jnp.int32),
                                        jnp.zeros((R, ), bool))
        self.kv_caches, samples, _ = self._decode_loop_fn(
            self.params, self.kv_caches, dec, 1)
        jax.block_until_ready(samples)

    def ms_carry_covers(self, out: SchedulerOutput) -> bool:
        """True when every request this multi-step schedules can source
        its current token without host knowledge: either the token is
        already in the host list, or the previous multi-step launch
        left a device-side carry at exactly this position (_ms_next).
        The engine uses this to decide whether horizon N+1 can launch
        before horizon N's outputs are processed (pipelined decode)."""
        for cr in out.scheduled_cached_reqs:
            st = self.batch.reqs.get(cr.req_id)
            if st is None:
                return False
            ph = getattr(st, "num_placeholders", 0)
            host_known = (cr.num_computed_tokens <
                          len(st.token_ids) - ph)
            if (not host_known and
                    self._ms_next.get(cr.req_id) != cr.num_computed_tokens):
                return False
        return True

    def _launch_multi_step(self, out: SchedulerOutput) -> "StepHandle":
        h = out.decode_horizon
        R = self.max_num_reqs
        b = self.batch
        cur = np.zeros((R, ), np.int32)
        pos = np.zeros((R, ), np.int32)
        active = np.zeros((R, ), bool)
        use_carry = np.zeros((R, ), bool)
        req_ids = []
        for req_id in out.num_scheduled_tokens:
            st = b.reqs[req_id]
            tok = st.token_ids[st.num_computed_tokens]
            if tok < 0:
                # In-flight token: only the device knows it (final
                # carry of the previous multi-step launch).
                assert (self._ms_next.get(req_id) ==
                        st.num_computed_tokens), (
                    f"{req_id}: multi-step launched without host token "
                    f"or device carry at {st.num_computed_tokens}")
                use_carry[st.row] = True
                self.ms_carry_hits += 1
            else:
                cur[st.row] = tok
            pos[st.row] = st.num_computed_tokens
            active[st.row] = True
            req_ids.append(req_id)
        # ONE packed host->device transfer (per-launch scalars + block
        # tables) feeding ONE executable — the remote tunnel charges a
        # round trip per upload and per eager device op, so the whole
        # launch is a single dispatch (_decode_launch_impl).
        mb = b.block_tables.shape[1]
        packed = np.empty((R, 4 + mb), np.int32)
        packed[:, 0] = cur
        packed[:, 1] = pos
        packed[:, 2] = active
        packed[:, 3] = use_carry
        # copy-by-assignment: pipelined launches mean the NEXT step's
        # append_block_ids can mutate b.block_tables before the async
        # upload drains.
        packed[:, 4:] = b.block_tables
        self._ensure_decode_cache()
        carry = (self._ms_carry if self._ms_carry is not None else
                 self._dec_zero)
        (self.kv_caches, samples, final_tokens,
         self._dec_steps_dev) = self._decode_launch_fn(
             self.params, self.kv_caches, packed, carry,
             self._dec_steps_dev, self._dec_sampling_dev,
             self._dec_lora_dev, self._dec_mrope_dev, h)
        # Device-side feedback for the NEXT launch (multi-step carry)
        # and for single-step async placeholders (_step_impl feedback).
        self._ms_carry = final_tokens
        self._last_sampled = final_tokens
        self._ms_next = {}
        for req_id in req_ids:
            st = b.reqs[req_id]
            self._ms_next[req_id] = st.num_computed_tokens + h
            # Advance RNG sample steps at LAUNCH: the next pipelined
            # horizon must not reuse this horizon's seeded steps.
            st.sample_step += h
            b.sample_steps[st.row] = st.sample_step
        return StepHandle(out=out, req_ids=req_ids, ms_samples=samples)

    def _finish_multi_step(self, hd: "StepHandle") -> ModelRunnerOutput:
        out, req_ids = hd.out, hd.req_ids
        h = out.decode_horizon
        b = self.batch
        samples_np = np.asarray(jax.device_get(hd.ms_samples))  # [h, R]
        result = ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=[])
        spec_out: list[list[int]] = []
        for req_id in req_ids:
            st = b.reqs.get(req_id)
            if st is None:
                # Finished/aborted while in flight (async): row purged.
                result.sampled_token_ids.append([])
                spec_out.append([])
                continue
            toks = [int(t) for t in samples_np[:, st.row]]
            result.sampled_token_ids.append(toks)
            # Backfill -1 placeholders (positions scheduled while these
            # tokens were in flight), then append the rest.
            ph = getattr(st, "num_placeholders", 0)
            fill = min(ph, len(toks))
            if fill:
                st.token_ids[len(st.token_ids) - ph:
                             len(st.token_ids) - ph + fill] = toks[:fill]
                st.num_placeholders = ph - fill
            st.token_ids.extend(toks[fill:])
            if (self.proposer is not None
                    and st.sampling_params.temperature == 0.0):
                spec_out.append(self.proposer.propose(st.token_ids))
            else:
                spec_out.append([])
        if self.proposer is not None:
            result.spec_token_ids = spec_out
        return result

    def _ensure_decode_cache(self) -> None:
        """Device-resident decode metadata, re-uploaded only when the
        persistent batch version changes (sampling params, LoRA slots,
        mrope deltas, RNG step counters)."""
        b = self.batch
        if getattr(self, "_dec_cache_ver", None) == b.version:
            return
        self._dec_sampling_dev = SamplingMetadata(
            temperature=jnp.asarray(b.temperature.copy()),
            top_k=jnp.asarray(b.top_k.copy()),
            top_p=jnp.asarray(b.top_p.copy()),
            min_p=jnp.asarray(b.min_p.copy()),
            seeds=jnp.asarray(b.seeds.copy()),
            steps=None,
        )
        self._dec_steps_dev = jnp.asarray(b.sample_steps.copy())
        self._dec_lora_dev = (jnp.asarray(b.lora_slots.copy())
                              if "lora" in self.params else None)
        self._dec_mrope_dev = (jnp.asarray(b.mrope_delta.copy())
                               if self.is_mrope else None)
        self._dec_zero = jnp.zeros((self.max_num_reqs, ), jnp.int32)
        self._dec_cache_ver = b.version

    def _build_decode_inputs(self, cur_tokens, pos, active,
                             advance_steps: int = 0):
        """Decode-loop inputs with device-resident sampling metadata.

        The per-row sampling arrays, LoRA slots and mrope deltas are
        cached on device keyed on InputBatch.version, so a pipelined
        horizon launch uploads only the packed scalar buffer and the
        block tables. RNG steps live on device and advance by
        ``advance_steps`` per launch (the host mirror is kept in sync
        without re-upload)."""
        b = self.batch
        self._ensure_decode_cache()
        steps = self._dec_steps_dev
        if advance_steps:
            # Advance only the rows this horizon actually decodes —
            # a skipped row's stream position must not drift from the
            # host mirror.
            self._dec_steps_dev = steps + (
                advance_steps * jnp.asarray(active).astype(jnp.int32))
        return DecodeLoopInputs(
            cur_tokens=cur_tokens,
            positions=jnp.asarray(pos),
            # .copy(): the H2D transfer is asynchronous and pipelined
            # launches mean the NEXT step's append_block_ids can
            # mutate b.block_tables before this upload drains.
            block_tables=jnp.asarray(b.block_tables.copy()),
            active=jnp.asarray(active),
            sampling=self._dec_sampling_dev._replace(steps=steps),
            lora_idx=self._dec_lora_dev,
            mrope_delta=self._dec_mrope_dev,
        )


@functools.partial(jax.jit, donate_argnums=(0, ))
def _scatter_blocks(cache: jax.Array, idx: jax.Array,
                    data: jax.Array) -> jax.Array:
    """In-place (donated) block upload: cache[idx] = data."""
    return cache.at[idx].set(data)


@functools.partial(jax.jit, donate_argnums=(0, ))
def _set_cache_row(cache: jax.Array, row: jax.Array,
                   data: jax.Array) -> jax.Array:
    """In-place (donated) per-row slab write (whisper cross-KV)."""
    return cache.at[row].set(data.astype(cache.dtype))


def _decode_launch_impl(model, mc, block_size, params, kv_caches,
                        packed, carry, steps, sampling, lora_idx,
                        mrope_delta, horizon: int):
    """Packed multi-step launch (see _decode_launch_fn): packed is
    [R, 4 + max_blocks] i32 = (cur_token, position, active, use_carry,
    block_tables...); carry is the previous horizon's device-side
    final tokens; steps the device-resident RNG step counters."""
    active = packed[:, 2] > 0
    cur = jnp.where(packed[:, 3] > 0, carry, packed[:, 0])
    dec = DecodeLoopInputs(
        cur_tokens=cur,
        positions=packed[:, 1],
        block_tables=packed[:, 4:],
        active=active,
        sampling=sampling._replace(steps=steps),
        lora_idx=lora_idx,
        mrope_delta=mrope_delta,
    )
    kv_caches, samples, final_tokens = _decode_loop_impl(
        model, mc, block_size, params, kv_caches, dec, horizon)
    steps_next = steps + horizon * active.astype(jnp.int32)
    return kv_caches, samples, final_tokens, steps_next


def _decode_loop_impl(model, mc, block_size, params, kv_caches,
                      dec: DecodeLoopInputs, horizon: int):
    """Device-side multi-step decode: `horizon` forward+sample
    iterations with token feedback in one lax.scan — one host round
    trip per horizon instead of per token."""
    R = dec.cur_tokens.shape[0]
    qsl = jnp.arange(R + 1, dtype=jnp.int32)  # every row: 1 token
    rows = jnp.arange(R, dtype=jnp.int32)

    def body(carry, i):
        kv_caches, tokens, positions = carry
        seq_lens = jnp.where(dec.active, positions + 1, 0)
        block_idx = positions // block_size
        slots = (jnp.take_along_axis(dec.block_tables, block_idx[:, None],
                                     axis=1)[:, 0] * block_size +
                 positions % block_size)
        # Inactive rows: block-table row is 0 -> writes land in the
        # null block.
        meta = AttentionMetadata(
            slot_mapping=slots,
            block_tables=dec.block_tables,
            query_start_loc=qsl,
            seq_lens=seq_lens,
        )
        # q_blk=1 routes to the decode-specialized attention kernel
        # (ops/pallas/decode_attention.py): row i of the flat token
        # stream IS request row i in this loop.
        lora_kw = {}
        if isinstance(params, dict) and "lora" in params:
            lora_kw = dict(lora=params["lora"], lora_idx=dec.lora_idx)
        # mrope decode: rope at position + delta (slots/seq_lens keep
        # the true position).
        rope_pos = (positions + dec.mrope_delta
                    if dec.mrope_delta is not None else positions)
        hidden, kv_caches = model.forward(params, mc, tokens, rope_pos,
                                          kv_caches, meta, q_blk=1,
                                          **lora_kw)
        logits = model.compute_logits(params, mc, hidden)
        sampled = sample(logits,
                         dec.sampling._replace(steps=dec.sampling.steps + i))
        return (kv_caches, sampled, positions + 1), sampled

    (kv_caches, final_tokens, _), samples = jax.lax.scan(
        body, (kv_caches, dec.cur_tokens, dec.positions),
        jnp.arange(horizon, dtype=jnp.int32))
    # final_tokens [R] is the device-side carry: the next horizon's
    # cur_tokens can be consumed without a host round trip (pipelined
    # multi-step decode — the host processes horizon N's outputs while
    # the device runs horizon N+1).
    return kv_caches, samples, final_tokens  # [horizon, R], [R]


def _unpack_grammar_mask(packed: jax.Array, vocab_size: int) -> jax.Array:
    """[R, W] uint32 -> [R, V] bool (little-endian bit order)."""
    R, W = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(R, W * 32)[:, :vocab_size] != 0


def _segment_pooling(hidden: jax.Array, qsl: jax.Array):
    """Per-row (sum, first, last) of the ragged hidden stream — the
    device half of chunked-prefill-safe pooling. Padding tokens (index
    >= qsl[-1]) fall into segment R and are dropped; zero-length rows
    produce garbage first/last entries the host never reads."""
    T = hidden.shape[0]
    R = qsl.shape[0] - 1
    row_of = jnp.searchsorted(qsl, jnp.arange(T, dtype=qsl.dtype),
                              side="right") - 1
    sums = jax.ops.segment_sum(hidden.astype(jnp.float32), row_of,
                               num_segments=R + 1)[:R]
    firsts = hidden[jnp.minimum(qsl[:R], T - 1)]
    lasts = hidden[jnp.clip(qsl[1:R + 1] - 1, 0, T - 1)]
    return sums, firsts, lasts


def _step_impl(model, mc, params, kv_caches, inputs: StepInputs,
               q_blk: int = 128, spec_k: int = 0, n_logprobs: int = 0,
               want_hidden: bool | tuple = False,
               want_pooling: bool = False, n_plp: int = 0,
               seg_hint: bool = True):
    """One fused device step: forward + logits + sample (+ greedy
    verification matrix when speculative decoding is on). With
    ``want_hidden`` the full [T, E] hidden stream is also returned
    (stays on device — feeds the EAGLE drafter); a tuple of layer
    indices instead returns the concatenated EAGLE-3 aux taps
    [T, 3E]; ``want_pooling`` adds per-row (sum, first, last) pooled
    hidden states."""
    if inputs.feedback_src is not None:
        # Async scheduling: tokens the host never saw (the previous
        # step's emission) resolve from that step's on-device samples.
        fb = inputs.feedback_src
        fed = inputs.prev_sampled[jnp.clip(fb, 0, None)]
        inputs = inputs._replace(
            input_ids=jnp.where(fb >= 0, fed, inputs.input_ids))
    meta = AttentionMetadata(
        slot_mapping=inputs.slot_mapping,
        block_tables=inputs.block_tables,
        query_start_loc=inputs.query_start_loc,
        seq_lens=inputs.seq_lens,
    )
    lora_kw = {}
    if isinstance(params, dict) and "lora" in params:
        lora_kw = dict(lora=params["lora"], lora_idx=inputs.lora_idx)
    if getattr(model, "USES_SEG_HINT", False):
        # Mamba-family models: static few-segments certificate that
        # gates the chunked SSD prefill (ops/mamba.py).
        lora_kw["seg_hint"] = seg_hint
    if inputs.mm_buffer is not None:
        lora_kw.update(mm_buffer=inputs.mm_buffer,
                       mm_rows=inputs.mm_rows)
    if inputs.positions3 is not None:
        lora_kw.update(positions3=inputs.positions3)
    if isinstance(want_hidden, tuple):
        hidden, kv_caches, aux = model.forward(
            params, mc, inputs.input_ids, inputs.positions, kv_caches,
            meta, q_blk=q_blk, aux_layers=want_hidden, **lora_kw)
        drafter_hidden = aux
    else:
        hidden, kv_caches = model.forward(params, mc, inputs.input_ids,
                                          inputs.positions, kv_caches,
                                          meta, q_blk=q_blk, **lora_kw)
        drafter_hidden = hidden if want_hidden else None
    # prompt_logprobs (ref: vllm prompt_logprobs — full-stream logits
    # during prefill, only on steps that scheduled such a request):
    # top-k per row + the actual next prompt token's logprob.
    plp = None
    if n_plp > 0:
        logp_all = jax.nn.log_softmax(
            model.compute_logits(params, mc, hidden).astype(jnp.float32),
            axis=-1)
        vals, ids = jax.lax.top_k(logp_all, n_plp)
        tgt = jnp.take_along_axis(
            logp_all, inputs.plp_targets[:, None], axis=-1)[:, 0]
        plp = (vals, ids, tgt)

    # Only sampled rows' logits matter: gather last-token hidden states
    # first so the LM head runs at [R*(K+1), E] not [T, E]
    # (ref analog: logits_indices gather in gpu_model_runner).
    R, K1 = inputs.logits_indices.shape
    if spec_k == 0:
        sampled_hidden = hidden[inputs.logits_indices[:, -1]]
        logits = model.compute_logits(params, mc, sampled_hidden)
        if inputs.penalties is not None:
            logits = apply_penalties(logits, inputs.penalties)
        if inputs.grammar_mask is not None:
            allow = _unpack_grammar_mask(inputs.grammar_mask,
                                         logits.shape[-1])
            logits = jnp.where(allow, logits, -jnp.inf)
        sampled = sample(logits, inputs.sampling)
        lp = (compute_topk_logprobs(logits, sampled, n_logprobs)
              if n_logprobs > 0 else None)
        pool = (_segment_pooling(hidden, inputs.query_start_loc)
                if want_pooling else None)
        return (kv_caches, sampled, None, lp,
                drafter_hidden, pool, plp)
    idx = inputs.logits_indices.reshape(-1)
    logits = model.compute_logits(params, mc, hidden[idx])
    logits = logits.reshape(R, K1, -1)
    # Penalties/grammar apply to every column: column K is the sampled
    # token, earlier columns feed greedy verification (rows with
    # penalties/grammar never get drafts — see execute_model — so for
    # them only column K matters and it is exact).
    if inputs.penalties is not None:
        logits = apply_penalties(
            logits.reshape(R * K1, -1),
            jax.tree.map(lambda a: jnp.repeat(a, K1, axis=0),
                         inputs.penalties)).reshape(R, K1, -1)
    if inputs.grammar_mask is not None:
        allow = _unpack_grammar_mask(inputs.grammar_mask,
                                     logits.shape[-1])
        logits = jnp.where(allow[:, None, :], logits, -jnp.inf)
    greedy_mat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    last = logits[:, -1]
    sampled = sample(last, inputs.sampling)
    lp = (compute_topk_logprobs(last, sampled, n_logprobs)
          if n_logprobs > 0 else None)
    # Stochastic rejection verification, fully on device (skipped at
    # runtime for all-greedy batches, like sample()'s random path).
    # With a device drafter that emits draft distributions
    # (inputs.draft_probs) acceptance uses the p/q ratio rule;
    # otherwise the point-mass (NO_DRAFT_PROBS) rule.
    meta = inputs.sampling
    dprobs = (inputs.draft_probs[:R]
              if inputs.draft_probs is not None else None)

    def stochastic(_):
        return spec_rejection_outputs(logits, inputs.draft_targets,
                                      dprobs, sampled, meta)

    def greedy_only(_):
        return (jnp.zeros((R, K1), jnp.int32),
                jnp.zeros((R, ), jnp.int32))

    spec_tokens, spec_n = jax.lax.cond(
        jnp.any(meta.temperature > 0.0), stochastic, greedy_only, None)
    pool = (_segment_pooling(hidden, inputs.query_start_loc)
            if want_pooling else None)
    return (kv_caches, sampled, (greedy_mat, spec_tokens, spec_n), lp,
            drafter_hidden, pool, plp)
