"""Async engine client: asyncio API over a background engine loop.

Ref analog: vllm/v1/engine/async_llm.py (AsyncLLM: ``generate():550``,
``add_request():283``, output handler task). Architecture difference:
the reference talks ZMQ to an EngineCoreProc; here the engine core runs
in a dedicated *thread* of this process (single-controller JAX owns the
TPU), and the asyncio side bridges with thread-safe queues. The
cross-process ZMQ client (engine/core_client.py) slots in behind the
same interface for multi-host serving.
"""

from __future__ import annotations

import asyncio
import queue
import threading
from typing import AsyncGenerator, Optional, Union

from vllm_tpu.config import EngineConfig
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.engine.outputs import RequestOutput
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.utils import Counter, init_logger

logger = init_logger(__name__)


class AsyncLLM:

    def __init__(self, config: EngineConfig, params=None, tokenizer=None,
                 mesh=None, worker_addrs=None, hb_bind=None) -> None:
        if worker_addrs:
            # Multi-host head: broadcast each step to the worker nodes
            # before executing it locally (engine/multihost.py).
            from vllm_tpu.engine.multihost import MultiHostEngine
            self.engine = MultiHostEngine(config, params=params,
                                          tokenizer=tokenizer, mesh=mesh,
                                          worker_addrs=worker_addrs,
                                          hb_bind=hb_bind)
        else:
            self.engine = LLMEngine(config, params=params,
                                    tokenizer=tokenizer, mesh=mesh)
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._new_requests: queue.Queue = queue.Queue()
        self._request_queues: dict[str, asyncio.Queue] = {}
        self._aborted: set[str] = set()
        self._reinit_attempts = 0
        self._counter = Counter()
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._busy_loop,
                                        name="engine-core", daemon=True)
        self._started = False

    @property
    def tokenizer(self):
        return self.engine.tokenizer

    def start(self) -> None:
        if not self._started:
            self._loop = asyncio.get_running_loop()
            self._thread.start()
            self._started = True

    def shutdown(self) -> None:
        self._shutdown.set()
        if getattr(self, "_wt_server", None) is not None:
            self._wt_server.close()
        if self._started:
            self._thread.join(timeout=10)

    # -- engine-thread side -------------------------------------------
    def _busy_loop(self) -> None:
        """Ref analog: EngineCoreProc.run_busy_loop (core.py:1372):
        drain the input queue (blocking when idle), then step.

        Fault tolerance (ref analog: EngineCoreSentinel
        fault_tolerant_wrapper, v1/fault_tolerance/engine_core_sentinel.
        py:173): a step failure aborts the in-flight requests (each
        caller gets the error) and the loop keeps serving; repeated
        back-to-back failures stop the engine."""
        consecutive_failures = 0
        while not self._shutdown.is_set():
            idle = not self.engine.has_unfinished_requests()
            try:
                # Block briefly when idle; just drain when busy.
                item = self._new_requests.get(timeout=0.05) if idle else \
                    self._new_requests.get_nowait()
                while True:
                    self._handle(item)
                    item = self._new_requests.get_nowait()
            except queue.Empty:
                pass
            if self.engine.has_unfinished_requests():
                try:
                    for out in self.engine.step():
                        self._emit(out)
                    consecutive_failures = 0
                except Exception as e:  # noqa: BLE001 — sentinel
                    consecutive_failures += 1
                    logger.exception("engine step failed (%d in a row)",
                                     consecutive_failures)
                    in_flight = list(self.engine.scheduler.requests)
                    self.engine.abort_request(in_flight)
                    for rid in in_flight:
                        self._emit_error(rid, e)
                    if consecutive_failures >= 3:
                        # Retry tier (ref analog: EngineCoreSentinel.
                        # retry engine_core_sentinel.py:122): rebuild
                        # scheduler + device state once before giving
                        # up; a failure during or after re-init is
                        # terminal.
                        if self._reinit_attempts < 1:
                            self._reinit_attempts += 1
                            try:
                                self.engine.reinitialize()
                                consecutive_failures = 0
                                continue
                            except Exception:  # noqa: BLE001
                                logger.exception("engine re-init failed")
                        logger.error("engine unhealthy; stopping loop")
                        self._shutdown.set()

    def _handle(self, item) -> None:
        kind, payload = item
        if kind == "add":
            req_id, prompt, params, lora_name, pooling, mm = payload
            try:
                self.engine.add_request(prompt, params, req_id,
                                        lora_name=lora_name,
                                        pooling_params=pooling,
                                        multi_modal_data=mm)
            except (ValueError, KeyError, AssertionError) as e:
                self._emit_error(req_id, e)
        elif kind == "add_lora":
            name, path, adapter = payload
            try:
                self.engine.add_lora(name, path, adapter)
            except Exception:  # noqa: BLE001 — log, keep serving
                logger.exception("add_lora(%r) failed", name)
        elif kind == "control":
            fn, args, done, err = payload
            try:
                fn(*args)
            except Exception as e:  # noqa: BLE001 — ack the caller
                err.append(e)
            finally:
                done.set()
        elif kind == "abort":
            self.engine.abort_request(payload)
        elif kind == "weights":
            flat, version, done, err = payload
            try:
                self.engine.apply_weight_update(flat, version)
            except Exception as e:  # noqa: BLE001 — ack the pusher
                err.append(e)
            finally:
                done.set()

    def _emit(self, out: RequestOutput) -> None:
        q = self._request_queues.get(out.request_id)
        if q is not None and self._loop is not None:
            self._loop.call_soon_threadsafe(q.put_nowait, out)

    def _emit_error(self, req_id: str, err: Exception) -> None:
        q = self._request_queues.get(req_id)
        if q is not None and self._loop is not None:
            self._loop.call_soon_threadsafe(q.put_nowait, err)

    def enable_weight_transfer(self, addr: str) -> None:
        """Accept RL weight pushes on ``addr`` (ZMQ REP). Updates ride
        the request queue so the engine thread installs them between
        steps (no lock on the hot path). Ref analog: weight_transfer
        engines, vllm/distributed/weight_transfer/."""
        import threading as _threading
        from vllm_tpu.engine.weight_transfer import WeightTransferServer

        def apply_fn(flat, version):
            done = _threading.Event()
            err: list = []
            self._new_requests.put(("weights", (flat, version, done,
                                                err)))
            if not done.wait(timeout=60):
                raise TimeoutError("engine did not apply weights")
            if err:
                raise err[0]

        self._wt_server = WeightTransferServer(addr, apply_fn)

    # -- asyncio side -------------------------------------------------
    def add_lora(self, name: str, path: Optional[str] = None,
                 adapter=None) -> None:
        """Register a LoRA adapter. Before the engine thread starts
        this applies synchronously; afterwards it rides the request
        queue (FIFO with generate(), so a subsequent request naming
        the adapter sees it registered). Ref analog: AsyncLLM.add_lora
        (vllm/v1/engine/async_llm.py)."""
        if adapter is None:
            # Parse the checkpoint here so bad paths fail the caller,
            # not the engine thread.
            from vllm_tpu.lora import load_peft_adapter
            adapter = load_peft_adapter(name, path)
        if not self._started:
            self.engine.add_lora(name, adapter=adapter)
        else:
            self._new_requests.put(("add_lora", (name, None, adapter)))

    def _control(self, fn, *args) -> None:
        """Run an engine control call ON the engine thread (between
        steps) and wait for it — /sleep, /wake_up, unload_lora,
        reset_prefix_cache (ref analog: the RPC-dispatched engine
        control methods, vllm/v1/engine/core.py)."""
        import threading as _threading
        if not self._started:
            fn(*args)
            return
        done = _threading.Event()
        err: list = []
        self._new_requests.put(("control", (fn, args, done, err)))
        if not done.wait(timeout=120):
            raise TimeoutError("engine did not run the control call")
        if err:
            raise err[0]

    def remove_lora(self, name: str) -> None:
        self._control(self.engine.remove_lora, name)

    def sleep(self, level: int = 1) -> None:
        self._control(self.engine.sleep, level)

    def wake_up(self) -> None:
        self._control(self.engine.wake_up)

    def is_sleeping(self) -> bool:
        return self.engine.is_sleeping  # property on the sync engine

    def reset_prefix_cache(self) -> bool:
        out: list = []
        self._control(lambda: out.append(
            self.engine.scheduler.kv_cache_manager.reset_prefix_cache()))
        return bool(out and out[0])

    @property
    def lora_adapters(self) -> list[str]:
        reg = self.engine.runner.lora_registry
        return list(reg.adapters) if reg is not None else []

    async def generate(
        self,
        prompt: Union[str, list[int]],
        sampling_params: Optional[SamplingParams] = None,
        request_id: Optional[str] = None,
        lora_name: Optional[str] = None,
        multi_modal_data=None,
    ) -> AsyncGenerator[RequestOutput, None]:
        """Yields incremental RequestOutputs until finished."""
        self.start()
        params = sampling_params or SamplingParams()
        req_id = request_id or f"async-{next(self._counter)}"
        out_q: asyncio.Queue = asyncio.Queue()
        self._request_queues[req_id] = out_q
        self._new_requests.put(("add", (req_id, prompt, params, lora_name,
                                        None, multi_modal_data)))
        # Wake the engine thread if it's blocked on the queue.
        try:
            while True:
                item = await out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
                if item.finished:
                    return
        finally:
            self._request_queues.pop(req_id, None)
            self._new_requests.put(("abort", [req_id]))

    async def embed(
        self,
        prompt: Union[str, list[int]],
        pooling_params=None,
        request_id: Optional[str] = None,
    ) -> RequestOutput:
        """Pooled-embedding request (ref analog: AsyncLLM.encode)."""
        from vllm_tpu.sample.params import PoolingParams
        self.start()
        pp = pooling_params or PoolingParams()
        req_id = request_id or f"embed-{next(self._counter)}"
        out_q: asyncio.Queue = asyncio.Queue()
        self._request_queues[req_id] = out_q
        self._new_requests.put(
            ("add", (req_id, prompt, SamplingParams(max_tokens=1),
                     None, pp, None)))
        try:
            while True:
                item = await out_q.get()
                if isinstance(item, Exception):
                    raise item
                if item.finished:
                    return item
        finally:
            self._request_queues.pop(req_id, None)
            self._new_requests.put(("abort", [req_id]))

    # -- scoring / reranking / classification (pooling family) -------

    def is_cross_encoder(self) -> bool:
        return "classifier" in self.engine.runner.params

    async def score(self, text_1, text_2) -> list[float]:
        """Pairwise relevance scores (ref analog: ServingScores,
        vllm/entrypoints/pooling/scoring/serving.py). Pair requests
        run concurrently through the engine's continuous batch."""
        import asyncio as _aio

        import numpy as np

        from vllm_tpu.engine import scoring
        from vllm_tpu.sample.params import PoolingParams
        l1, l2 = scoring.broadcast_pairs(text_1, text_2)
        if self.is_cross_encoder():
            hf = self.engine.config.model.hf_config
            tok = self.engine.tokenizer
            pp = PoolingParams(pooling_type="cls", normalize=False)
            outs = await _aio.gather(*[
                self.embed(scoring.pair_ids(tok, hf, a, b), pp)
                for a, b in zip(l1, l2)
            ])
            logits = scoring.apply_classifier(
                self.engine.runner.params,
                np.stack([o.embedding for o in outs]))
            return scoring.relevance_scores(logits)
        ea = await _aio.gather(*[self.embed(p) for p in l1])
        eb = await _aio.gather(*[self.embed(p) for p in l2])
        return [scoring.cosine(a.embedding, b.embedding)
                for a, b in zip(ea, eb)]

    async def rerank(self, query, documents,
                     top_n: int = 0) -> list[dict]:
        docs = documents if isinstance(documents, list) else [documents]
        scores = await self.score([query] * len(docs), docs)
        order = sorted(range(len(docs)), key=lambda i: -scores[i])
        if top_n:
            order = order[:top_n]
        return [{"index": i, "relevance_score": scores[i]}
                for i in order]

    async def classify(self, prompts) -> list[dict]:
        import asyncio as _aio

        import numpy as np

        from vllm_tpu.engine import scoring
        from vllm_tpu.sample.params import PoolingParams
        if isinstance(prompts, str) or (isinstance(prompts, list)
                                        and prompts
                                        and isinstance(prompts[0], int)):
            prompts = [prompts]
        pp = PoolingParams(pooling_type="cls", normalize=False)
        outs = await _aio.gather(*[self.embed(p, pp) for p in prompts])
        probs = scoring.softmax_probs(scoring.apply_classifier(
            self.engine.runner.params,
            np.stack([o.embedding for o in outs])))
        hf = self.engine.config.model.hf_config or {}
        id2label = hf.get("id2label") or {}
        return [{
            "label": id2label.get(str(int(r.argmax())),
                                  id2label.get(int(r.argmax()),
                                               int(r.argmax()))),
            "probs": [float(v) for v in r],
        } for r in probs]

    async def abort(self, request_id: str) -> None:
        self._new_requests.put(("abort", [request_id]))
