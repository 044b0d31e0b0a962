"""Offline batch-inference API.

Ref analog: vllm/entrypoints/llm.py (LLM:67, generate():414).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             ParallelConfig, QuantizationConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.engine.outputs import RequestOutput
from vllm_tpu.sample.params import SamplingParams


class LLM:

    def __init__(
        self,
        model: str,
        *,
        max_model_len: int = 2048,
        dtype: str = "bfloat16",
        block_size: int = 32,
        max_num_seqs: int = 64,
        max_num_batched_tokens: int = 2048,
        num_kv_blocks: Optional[int] = None,
        enable_prefix_caching: bool = True,
        quantization: Optional[str] = None,
        tensor_parallel_size: int = 1,
        seed: int = 0,
        engine_config: Optional[EngineConfig] = None,
        params: Optional[dict] = None,
        tokenizer=None,
        mesh=None,
    ) -> None:
        if engine_config is None:
            from vllm_tpu.loader.hf_config import model_config_from_hf
            model_config = model_config_from_hf(model,
                                                max_model_len=max_model_len,
                                                dtype=dtype)
            # Auto-detect from the checkpoint's quantization_config;
            # `quantization` is an optional override/hint.
            from vllm_tpu.quant.config import detect_quant_config
            quant = detect_quant_config(model, quantization)
            engine_config = EngineConfig(
                model=model_config,
                cache=CacheConfig(block_size=block_size,
                                  num_gpu_blocks=num_kv_blocks,
                                  enable_prefix_caching=enable_prefix_caching),
                scheduler=SchedulerConfig(
                    max_num_batched_tokens=max_num_batched_tokens,
                    max_num_seqs=max_num_seqs),
                parallel=ParallelConfig(
                    tensor_parallel_size=tensor_parallel_size),
                quant=quant,
                seed=seed,
            )
        self.engine = LLMEngine(engine_config, params=params,
                                tokenizer=tokenizer, mesh=mesh)

    def add_lora(self, name: str, path: Optional[str] = None,
                 adapter=None) -> None:
        """Register a LoRA adapter for use via generate(lora_name=...).
        Ref analog: LLM.generate(lora_request=...) registration
        (vllm/entrypoints/llm.py)."""
        self.engine.add_lora(name, path, adapter)

    def generate(
        self,
        prompts: Union[str, Sequence[Union[str, list[int]]]],
        sampling_params: Optional[Union[SamplingParams,
                                        Sequence[SamplingParams]]] = None,
        lora_name: Optional[str] = None,
        multi_modal_data: Optional[Sequence] = None,  # per prompt
    ) -> list[RequestOutput]:
        if isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts)
        if multi_modal_data is None:
            multi_modal_data = [None] * n
        if sampling_params is None:
            sampling_params = [SamplingParams()] * n
        elif isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n
        assert len(sampling_params) == n

        # n>1 fan-out (ref analog: vllm/v1/engine/parallel_sampling.py):
        # each sample runs as its own engine request; outputs regroup.
        import dataclasses
        order: list[list[str]] = []
        for prompt, sp, mm in zip(prompts, sampling_params,
                                  multi_modal_data):
            fan = []
            for i in range(sp.n):
                child = sp if sp.n == 1 else dataclasses.replace(
                    sp, n=1,
                    seed=None if sp.seed is None else sp.seed + i)
                fan.append(
                    self.engine.add_request(prompt, child,
                                            lora_name=lora_name,
                                            multi_modal_data=mm))
            order.append(fan)

        finals: dict[str, RequestOutput] = {}
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                if out.finished:
                    finals[out.request_id] = out
        results = []
        for fan in order:
            first = finals[fan[0]]
            if len(fan) == 1:
                results.append(first)
                continue
            merged = RequestOutput(
                request_id=fan[0], prompt=first.prompt,
                prompt_token_ids=first.prompt_token_ids, outputs=[],
                finished=True)
            for i, rid in enumerate(fan):
                c = finals[rid].outputs[0]
                c.index = i
                merged.outputs.append(c)
            results.append(merged)
        return results

    def embed(
        self,
        prompts: Union[str, Sequence[Union[str, list[int]]]],
        pooling_params=None,
    ) -> list[RequestOutput]:
        """Embedding/pooling requests (ref analog: LLM.embed/encode,
        vllm/entrypoints/llm.py). Returns RequestOutputs whose
        ``embedding`` field carries the pooled vector."""
        from vllm_tpu.sample.params import PoolingParams
        if isinstance(prompts, str):
            prompts = [prompts]
        pp = pooling_params or PoolingParams()
        ids = [
            self.engine.add_request(p, SamplingParams(max_tokens=1),
                                    pooling_params=pp) for p in prompts
        ]
        finals: dict[str, RequestOutput] = {}
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                if out.finished:
                    finals[out.request_id] = out
        return [finals[i] for i in ids]

    # -- scoring / reranking / classification (pooling family) -------

    def _is_cross_encoder(self) -> bool:
        return "classifier" in self.engine.runner.params

    def score(self, text_1, text_2) -> list[float]:
        """Pairwise relevance scores (ref analog: LLM.score /
        entrypoints/pooling/scoring/serving.py). text_1 x text_2
        broadcast 1xN / Nx1 / NxN elementwise. Cross-encoder
        checkpoints (params carry a ``classifier`` head) run each pair
        through one joint forward; embedding checkpoints fall back to
        cosine similarity."""
        from vllm_tpu.engine import scoring
        from vllm_tpu.sample.params import PoolingParams
        l1, l2 = scoring.broadcast_pairs(text_1, text_2)
        if self._is_cross_encoder():
            import numpy as np
            hf = self.engine.config.model.hf_config
            tok = self.engine.tokenizer
            pp = PoolingParams(pooling_type="cls", normalize=False)
            outs = self.embed([scoring.pair_ids(tok, hf, a, b)
                               for a, b in zip(l1, l2)], pp)
            logits = scoring.apply_classifier(
                self.engine.runner.params,
                np.stack([o.embedding for o in outs]))
            return scoring.relevance_scores(logits)
        ea = self.embed(l1)
        eb = self.embed(l2)
        return [scoring.cosine(a.embedding, b.embedding)
                for a, b in zip(ea, eb)]

    def rerank(self, query, documents, top_n: int = 0) -> list[dict]:
        """Rank documents by relevance to query (ref analog: /rerank).
        Returns [{index, relevance_score}] sorted descending."""
        docs = documents if isinstance(documents, list) else [documents]
        scores = self.score([query] * len(docs), docs)
        order = sorted(range(len(docs)), key=lambda i: -scores[i])
        if top_n:
            order = order[:top_n]
        return [{"index": i, "relevance_score": scores[i]}
                for i in order]

    def classify(self, prompts) -> list[dict]:
        """Sequence classification over the CLS head (ref analog:
        entrypoints/pooling/classify). Returns per-input
        {label, probs} with softmax probabilities."""
        import numpy as np
        from vllm_tpu.engine import scoring
        from vllm_tpu.sample.params import PoolingParams
        assert self._is_cross_encoder(), \
            "classify requires a checkpoint with a classifier head"
        if isinstance(prompts, str) or (isinstance(prompts, list)
                                        and prompts
                                        and isinstance(prompts[0], int)):
            prompts = [prompts]
        pp = PoolingParams(pooling_type="cls", normalize=False)
        outs = self.embed(prompts, pp)
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

    def chat(self, messages, sampling_params=None) -> list[RequestOutput]:
        tok = self.engine.tokenizer
        assert tok is not None
        prompt = tok.apply_chat_template(messages,
                                         add_generation_prompt=True)
        return self.generate([prompt], sampling_params)
