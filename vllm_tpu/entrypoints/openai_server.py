"""OpenAI-compatible HTTP server (aiohttp).

Ref analog: vllm/entrypoints/openai/ (FastAPI app, api_server.py
run_server():751) — same wire protocol, aiohttp transport (fastapi is
not in this image). Endpoints:

- GET  /health, GET /v1/models
- POST /v1/completions        (prompt or token ids; stream or not)
- POST /v1/chat/completions   (chat template; stream or not)

Streaming uses SSE ``data:`` frames ending with ``data: [DONE]``.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any, Optional

from aiohttp import web

from vllm_tpu.engine.async_llm import AsyncLLM
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


def _sampling_params_from(body: dict[str, Any]) -> SamplingParams:
    # response_format follows the OpenAI structured-output surface:
    # {"type": "json_schema", "json_schema": {"schema": {...}}} (ref:
    # vllm/entrypoints/openai/protocol.py response_format handling);
    # guided_* are the vLLM extension params.
    rf = body.get("response_format") or {}
    guided_json = body.get("guided_json")
    if guided_json is None and rf.get("type") == "json_schema":
        guided_json = (rf.get("json_schema") or {}).get("schema")
    return SamplingParams(
        n=1,
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", 0)),
        min_p=float(body.get("min_p", 0.0)),
        seed=body.get("seed"),
        max_tokens=int(body.get("max_tokens", 16)),
        stop=body.get("stop"),
        stop_token_ids=body.get("stop_token_ids", []),
        ignore_eos=bool(body.get("ignore_eos", False)),
        logprobs=body.get("logprobs"),
        logit_bias={int(k): float(v) for k, v in
                    (body.get("logit_bias") or {}).items()} or None,
        prompt_logprobs=body.get("prompt_logprobs"),
        guided_choice=(body.get("guided_choice")
                       or rf.get("choices")),
        guided_regex=body.get("guided_regex"),
        guided_json=guided_json,
        guided_grammar=body.get("guided_grammar"),
        repetition_penalty=float(body.get("repetition_penalty", 1.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
    )


def _logprobs_block(final, c, echo: bool) -> Optional[dict]:
    """OpenAI completions `logprobs` object: token_logprobs /
    top_logprobs aligned to (echoed prompt +) output tokens. Prompt
    entries come from SamplingParams.prompt_logprobs (position 0 is
    null, OpenAI convention)."""
    if c.logprobs is None and final.prompt_logprobs is None:
        return None
    token_lps: list = []
    top: list = []
    toks: list[int] = []
    if echo and final.prompt_logprobs is not None:
        for pos, entry in enumerate(final.prompt_logprobs):
            tid = final.prompt_token_ids[pos]
            toks.append(tid)
            if entry is None:
                token_lps.append(None)
                top.append(None)
            else:
                token_lps.append(entry.get(tid))
                top.append({str(k): v for k, v in entry.items()})
    for tid, entry in zip(c.token_ids, c.logprobs or []):
        toks.append(tid)
        token_lps.append(entry.get(tid))
        top.append({str(k): v for k, v in entry.items()})
    return {
        "tokens": [str(t) for t in toks],
        "token_logprobs": token_lps,
        "top_logprobs": top,
        "text_offset": [],
    }


class OpenAIServer:

    def __init__(self, async_llm: AsyncLLM,
                 model_name: str = "vllm-tpu-model",
                 lora_modules: Optional[dict[str, str]] = None,
                 tool_parser: Optional[str] = None,
                 reasoning_parser: Optional[str] = None) -> None:
        self.llm = async_llm
        self.model_name = model_name
        # name -> path; registered eagerly so the first request pays no
        # stack-build latency (ref analog: --lora-modules,
        # vllm/entrypoints/openai/serving_models.py LoRAModulePath).
        for name, path in (lora_modules or {}).items():
            self.llm.add_lora(name, path)
        # Tool-call / reasoning post-processing (ref analog:
        # --tool-call-parser / --reasoning-parser, vllm/tool_parsers
        # and vllm/reasoning registries).
        from vllm_tpu.parsers import (get_reasoning_parser,
                                      get_tool_parser)
        self.tool_parser = (get_tool_parser(tool_parser)
                            if tool_parser else None)
        self.reasoning_parser = (get_reasoning_parser(reasoning_parser)
                                 if reasoning_parser else None)

    def _route_model(self, body: dict) -> Optional[str]:
        """OpenAI `model` routing: a registered adapter name selects
        that LoRA (ref analog: serving_engine._maybe_get_adapters)."""
        model = body.get("model")
        if model and model in self.llm.lora_adapters:
            return model
        return None

    # -- routes -------------------------------------------------------
    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/health", self.health)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_get("/v1/models", self.models)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/v1/embeddings", self.embeddings)
        # Score / rerank / classify (ref: entrypoints/pooling/
        # {scoring,classify}/api_router.py).
        app.router.add_post("/score", self.score)
        app.router.add_post("/v1/score", self.score)
        app.router.add_post("/rerank", self.rerank)
        app.router.add_post("/v1/rerank", self.rerank)
        app.router.add_post("/v2/rerank", self.rerank)
        app.router.add_post("/classify", self.classify)
        # Responses API (ref: entrypoints/openai/responses/
        # api_router.py:48-110 — create/get/cancel + background mode).
        # Cohere Chat v2 (ref: entrypoints/cohere/api_router.py —
        # POST /cohere/v2/chat).
        app.router.add_post("/cohere/v2/chat", self.cohere_chat_v2)
        app.router.add_post("/v1/responses", self.responses_create)
        app.router.add_get("/v1/responses/{response_id}",
                           self.responses_get)
        app.router.add_post("/v1/responses/{response_id}/cancel",
                            self.responses_cancel)
        app.router.add_post("/v1/audio/transcriptions",
                            self.transcriptions)
        app.router.add_post("/v1/audio/translations", self.transcriptions)
        app.router.add_post("/v1/unload_lora_adapter", self.unload_lora)
        app.router.add_post("/reset_prefix_cache",
                            self.reset_prefix_cache)
        app.router.add_post("/sleep", self.sleep)
        app.router.add_post("/wake_up", self.wake_up)
        app.router.add_get("/is_sleeping", self.is_sleeping)
        app.router.add_post("/tokenize", self.tokenize)
        app.router.add_post("/detokenize", self.detokenize)
        app.router.add_get("/version", self.version)
        app.router.add_get("/ping", self.health)
        app.router.add_post("/ping", self.health)
        app.router.add_post("/v1/load_lora_adapter", self.load_lora)
        app.router.add_post("/start_profile", self.start_profile)
        app.router.add_post("/stop_profile", self.stop_profile)
        # Anthropic Messages API on the same engine (ref analog:
        # vllm/entrypoints/anthropic/).
        from vllm_tpu.entrypoints.anthropic import AnthropicRoutes
        AnthropicRoutes(self).register(app)
        return app

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def metrics(self, request: web.Request) -> web.Response:
        text = self.llm.engine.metrics.prometheus_text()
        return web.Response(text=text,
                            content_type="text/plain",
                            charset="utf-8")

    async def models(self, request: web.Request) -> web.Response:
        now = int(time.time())
        data = [{
            "id": self.model_name,
            "object": "model",
            "created": now,
            "owned_by": "vllm_tpu",
        }]
        data += [{
            "id": name,
            "object": "model",
            "created": now,
            "owned_by": "vllm_tpu",
            "parent": self.model_name,
        } for name in self.llm.lora_adapters]
        return web.json_response({"object": "list", "data": data})

    async def load_lora(self, request: web.Request) -> web.Response:
        """Dynamic adapter registration (ref analog: the
        /v1/load_lora_adapter route, vllm api_server.py)."""
        body = await request.json()
        name, path = body.get("lora_name"), body.get("lora_path")
        if not name or not path:
            return _err("need 'lora_name' and 'lora_path'")
        try:
            self.llm.add_lora(name, path)
        except Exception as e:  # noqa: BLE001 — surface to client
            return _err(f"failed to load adapter: {e}", 400)
        return web.json_response(
            {"status": "ok", "lora_name": name})

    async def start_profile(self, request: web.Request) -> web.Response:
        """jax.profiler trace start (ref analog: vllm /start_profile)."""
        d = self.llm.engine.start_profile()
        return web.json_response({"status": "ok", "log_dir": d})

    async def stop_profile(self, request: web.Request) -> web.Response:
        self.llm.engine.stop_profile()
        return web.json_response({"status": "ok"})

    async def embeddings(self, request: web.Request) -> web.Response:
        """OpenAI embeddings API over the pooling runner path (ref
        analog: serving_embedding.py)."""
        from vllm_tpu.sample.params import PoolingParams
        body = await request.json()
        inputs = body.get("input")
        if inputs is None:
            return _err("missing 'input'")
        if isinstance(inputs, str) or (isinstance(inputs, list) and inputs
                                       and isinstance(inputs[0], int)):
            inputs = [inputs]
        pp = PoolingParams(dimensions=body.get("dimensions"))
        data = []
        total_tokens = 0
        for i, prompt in enumerate(inputs):
            out = await self.llm.embed(prompt, pp)
            total_tokens += len(out.prompt_token_ids)
            data.append({
                "object": "embedding",
                "index": i,
                "embedding": out.embedding,
            })
        return web.json_response({
            "object": "list",
            "data": data,
            "model": body.get("model", self.model_name),
            "usage": {
                "prompt_tokens": total_tokens,
                "total_tokens": total_tokens,
            },
        })

    async def score(self, request: web.Request) -> web.Response:
        """Pairwise relevance scoring (ref analog: /score, /v1/score —
        entrypoints/pooling/scoring/api_router.py:38-69; response
        shape ScoreResponse, protocol.py:172-184)."""
        import time as _t
        import uuid as _uuid
        body = await request.json()
        t1, t2 = body.get("text_1"), body.get("text_2")
        if t1 is None or t2 is None:
            return _err("missing 'text_1'/'text_2'")
        try:
            scores = await self.llm.score(t1, t2)
        except ValueError as e:
            return _err(str(e))
        return web.json_response({
            "id": f"score-{_uuid.uuid4().hex[:16]}",
            "object": "list",
            "created": int(_t.time()),
            "model": body.get("model", self.model_name),
            "data": [{"index": i, "object": "score", "score": s}
                     for i, s in enumerate(scores)],
            "usage": {"prompt_tokens": 0, "total_tokens": 0},
        })

    async def rerank(self, request: web.Request) -> web.Response:
        """Document reranking (ref analog: /rerank /v1/rerank
        /v2/rerank — scoring/api_router.py:71-110; RerankResponse,
        protocol.py:154-169)."""
        import uuid as _uuid
        body = await request.json()
        query = body.get("query")
        documents = body.get("documents")
        if query is None or documents is None:
            return _err("missing 'query'/'documents'")
        docs = documents if isinstance(documents, list) else [documents]
        try:
            results = await self.llm.rerank(query, docs,
                                            int(body.get("top_n") or 0))
        except ValueError as e:
            return _err(str(e))
        return web.json_response({
            "id": f"rerank-{_uuid.uuid4().hex[:16]}",
            "model": body.get("model", self.model_name),
            "usage": {"prompt_tokens": 0, "total_tokens": 0},
            "results": [{
                "index": r["index"],
                "document": {"text": docs[r["index"]] if isinstance(
                    docs[r["index"]], str) else None},
                "relevance_score": r["relevance_score"],
            } for r in results],
        })

    async def classify(self, request: web.Request) -> web.Response:
        """Sequence classification (ref analog: entrypoints/pooling/
        classify/api_router.py /classify)."""
        import time as _t
        import uuid as _uuid
        body = await request.json()
        inputs = body.get("input")
        if inputs is None:
            return _err("missing 'input'")
        if not self.llm.is_cross_encoder():
            return _err("model has no classifier head", 400)
        try:
            results = await self.llm.classify(inputs)
        except ValueError as e:
            return _err(str(e))
        return web.json_response({
            "id": f"classify-{_uuid.uuid4().hex[:16]}",
            "object": "list",
            "created": int(_t.time()),
            "model": body.get("model", self.model_name),
            "data": [{
                "index": i,
                "label": r["label"],
                "probs": r["probs"],
                "num_classes": len(r["probs"]),
            } for i, r in enumerate(results)],
        })

    async def unload_lora(self, request: web.Request) -> web.Response:
        """Ref analog: /v1/unload_lora_adapter (api_server.py)."""
        body = await request.json()
        name = body.get("lora_name")
        if not name:
            return _err("missing 'lora_name'")
        try:
            self.llm.remove_lora(name)
        except KeyError as e:
            return _err(str(e), 404)
        except ValueError as e:
            return _err(str(e), 409)
        return web.json_response({"status": "ok"})

    async def reset_prefix_cache(self,
                                 request: web.Request) -> web.Response:
        """Ref analog: /reset_prefix_cache (api_server.py)."""
        ok = self.llm.reset_prefix_cache()
        return web.json_response({"status": "ok" if ok else "busy"})

    async def sleep(self, request: web.Request) -> web.Response:
        """Ref analog: /sleep?level= (RL idle periods; engine/state.py
        SleepManager frees HBM, weights staged to host at level 1)."""
        level = int(request.query.get("level", "1"))
        try:
            self.llm.sleep(level)
        except AssertionError as e:
            return _err(str(e), 409)
        return web.json_response({"status": "sleeping", "level": level})

    async def wake_up(self, request: web.Request) -> web.Response:
        self.llm.wake_up()
        return web.json_response({"status": "awake"})

    async def is_sleeping(self, request: web.Request) -> web.Response:
        return web.json_response({"is_sleeping": self.llm.is_sleeping()})

    async def version(self, request: web.Request) -> web.Response:
        from vllm_tpu import __version__
        return web.json_response({"version": __version__})

    async def tokenize(self, request: web.Request) -> web.Response:
        """Tokenization API (ref analog: vllm/entrypoints/openai/
        serving_tokenization.py /tokenize): prompt or chat messages ->
        token ids (+count, model max)."""
        tok = self.llm.tokenizer
        if tok is None:
            return _err("server has no tokenizer", 400)
        body = await request.json()
        if body.get("messages"):
            try:
                text = tok.apply_chat_template(
                    body["messages"],
                    add_generation_prompt=bool(
                        body.get("add_generation_prompt", True)))
            except Exception:
                text = "".join(f"{m['role']}: {m['content']}\n"
                               for m in body["messages"])
        else:
            text = body.get("prompt")
            if text is None:
                return _err("missing 'prompt' or 'messages'")
        if isinstance(text, str):
            ids = tok.encode(
                text,
                add_special_tokens=bool(
                    body.get("add_special_tokens", True)))
        else:
            ids = list(text)
        mc = self.llm.engine.config.model
        return web.json_response({
            "tokens": list(ids),
            "count": len(ids),
            "max_model_len": mc.max_model_len,
        })

    async def detokenize(self, request: web.Request) -> web.Response:
        """Inverse of /tokenize (ref analog: serving_tokenization.py
        /detokenize)."""
        tok = self.llm.tokenizer
        if tok is None:
            return _err("server has no tokenizer", 400)
        body = await request.json()
        ids = body.get("tokens")
        if ids is None:
            return _err("missing 'tokens'")
        return web.json_response({"prompt": tok.decode(list(ids))})

    async def transcriptions(self, request: web.Request) -> web.Response:
        """OpenAI audio transcription API over the whisper path (ref
        analog: vllm/entrypoints/openai/speech_to_text.py). Accepts
        multipart form with a WAV ``file`` (PCM16/PCM32) or JSON with a
        raw ``audio`` float waveform / precomputed ``mel`` features."""
        import numpy as np

        from vllm_tpu.audio import HOP, log_mel_spectrogram

        mc = self.llm.engine.config.model
        if mc.audio is None:
            return _err("model has no audio encoder", 400)
        temperature = 0.0
        mel = None
        if request.content_type.startswith("multipart/"):
            form = await request.post()
            f = form.get("file")
            if f is None:
                return _err("missing 'file'")
            temperature = float(form.get("temperature", 0.0) or 0.0)
            import io
            import wave
            with wave.open(io.BytesIO(f.file.read())) as w:
                sw = w.getsampwidth()
                raw = w.readframes(w.getnframes())
                if sw == 1:  # 8-bit WAV PCM is UNSIGNED (128 bias)
                    wav = (np.frombuffer(raw, np.uint8).astype(
                        np.float32) - 128.0) / 128.0
                else:
                    dt = {2: np.int16, 4: np.int32}[sw]
                    wav = (np.frombuffer(raw, dt).astype(np.float32) /
                           float(2**(8 * sw - 1)))
                if w.getnchannels() > 1:
                    wav = wav.reshape(-1, w.getnchannels()).mean(axis=1)
        else:
            body = await request.json()
            temperature = float(body.get("temperature") or 0.0)
            if body.get("mel") is not None:
                mel = np.asarray(body["mel"], np.float32)
            elif body.get("audio") is not None:
                wav = np.asarray(body["audio"], np.float32)
            else:
                return _err("missing 'file'/'audio'/'mel'")
        F = mc.audio["max_source_positions"]
        if mel is None:
            mel = log_mel_spectrogram(wav, n_samples=2 * F * HOP)
        mel = mel[:, :2 * F]
        # Decoder prompt: start token (+ any checkpoint-forced ids).
        hf = mc.hf_config or {}
        prompt = [hf.get("decoder_start_token_id", 50258)]
        for _, tok in (hf.get("forced_decoder_ids") or []):
            prompt.append(tok)
        params = SamplingParams(temperature=temperature,
                                max_tokens=mc.max_model_len -
                                len(prompt) - 1)
        req_id = f"transcribe-{uuid.uuid4().hex[:24]}"
        final = None
        async for out in self.llm.generate(prompt, params, req_id,
                                           multi_modal_data={
                                               "audio": mel}):
            final = out
        toks = final.outputs[0].token_ids
        tok = self.llm.tokenizer
        text = (tok.decode(toks, skip_special_tokens=True)
                if tok is not None else "")
        return web.json_response({
            "text": text,
            "tokens": toks,
            "usage": {"total_tokens": len(prompt) + len(toks)},
        })

    async def completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        prompt = body.get("prompt")
        if prompt is None:
            return _err("missing 'prompt'")
        if body.get("suffix"):
            # Insertion-mode completions need an infilling-capable
            # model (ref: vllm rejects suffix the same way).
            return _err("suffix is not supported", 400)
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], str):
            prompt = prompt[0]  # batch-of-one only for now
        params = _sampling_params_from(body)
        echo = bool(body.get("echo"))
        if echo and params.logprobs is not None \
                and params.prompt_logprobs is None:
            # OpenAI echo+logprobs returns prompt token logprobs too.
            params.prompt_logprobs = params.logprobs
        best_of = int(body.get("best_of") or 0)
        lora = self._route_model(body)
        req_id = f"cmpl-{uuid.uuid4().hex[:24]}"
        if body.get("stream"):
            if best_of > 1:
                return _err("best_of is not supported with stream", 400)
            return await self._stream(request, req_id, prompt, params,
                                      chat=False, lora_name=lora,
                                      echo=echo)
        if best_of > 1:
            return await self._best_of(req_id, prompt, params, best_of,
                                       lora_name=lora, echo=echo)
        return await self._complete(req_id, prompt, params, chat=False,
                                    lora_name=lora, echo=echo)

    async def cohere_chat_v2(self, request: web.Request) -> web.Response:
        """Cohere Chat v2 (ref: entrypoints/cohere/protocol.py
        CohereChatV2Request:128 / serving.py response assembly).
        Non-streaming; message content parts of type text."""
        body = await request.json()
        messages = body.get("messages")
        if not messages:
            return _err("missing 'messages'")
        if self.llm.tokenizer is None:
            return _err("server has no tokenizer", 400)
        norm = []
        for m in messages:
            content = m.get("content")
            if isinstance(content, list):
                content = "".join(p.get("text", "") for p in content
                                  if isinstance(p, dict))
            norm.append({"role": (m.get("role") or "user").lower(),
                         "content": content or ""})
        tok = self.llm.tokenizer
        try:
            prompt = tok.apply_chat_template(norm,
                                             add_generation_prompt=True)
        except Exception:
            prompt = "".join(f"{m['role']}: {m['content']}\n"
                             for m in norm) + "assistant:"
        params = SamplingParams(
            temperature=body.get("temperature", 0.3),
            max_tokens=body.get("max_tokens") or 256,
            stop=body.get("stop_sequences") or None,
        )
        req_id = f"chat_{uuid.uuid4().hex[:24]}"
        final = None
        async for out in self.llm.generate(prompt, params, req_id):
            final = out
        c = final.outputs[0]
        finish = {"stop": "STOP_SEQUENCE", "length": "MAX_TOKENS",
                  "eos": "COMPLETE"}.get(c.finish_reason or "eos",
                                         "COMPLETE")
        n_in = len(final.prompt_token_ids or [])
        n_out = len(c.token_ids or [])
        return web.json_response({
            "id": req_id,
            "finish_reason": finish,
            "message": {
                "role": "assistant",
                "content": [{"type": "text", "text": c.text or ""}],
            },
            "usage": {
                "billed_units": {"input_tokens": n_in,
                                 "output_tokens": n_out},
                "tokens": {"input_tokens": n_in,
                           "output_tokens": n_out},
            },
        })

    # -- Responses API (ref: openai/responses/api_router.py:48-110,
    # protocol.py ResponsesRequest:136 / ResponsesResponse:636) -------

    def _responses_store(self) -> dict:
        if not hasattr(self, "_responses"):
            self._responses: dict[str, dict] = {}
            self._response_tasks: dict[str, Any] = {}
        return self._responses

    def _render_response_input(self, body: dict) -> tuple:
        """-> (prompt, messages) from instructions + input (+ the
        previous response's conversation for previous_response_id)."""
        messages: list[dict] = []
        prev_id = body.get("previous_response_id")
        if prev_id:
            prev = self._responses_store().get(prev_id)
            if prev is None:
                raise KeyError(prev_id)
            messages.extend(prev.get("_messages", []))
        if body.get("instructions"):
            messages.append({"role": "system",
                             "content": body["instructions"]})
        inp = body.get("input")
        if isinstance(inp, str):
            messages.append({"role": "user", "content": inp})
        else:
            for item in inp or []:
                content = item.get("content")
                if isinstance(content, list):  # typed content parts
                    content = "".join(
                        p.get("text", "") for p in content
                        if isinstance(p, dict))
                messages.append({"role": item.get("role", "user"),
                                 "content": content})
        tok = self.llm.tokenizer
        try:
            prompt = tok.apply_chat_template(messages,
                                             add_generation_prompt=True)
        except Exception:
            prompt = "".join(f"{m['role']}: {m['content']}\n"
                             for m in messages) + "assistant:"
        return prompt, messages

    def _response_record(self, resp_id: str, body: dict,
                         messages: list[dict]) -> dict:
        import time as _t
        return {
            "id": resp_id,
            "object": "response",
            "created_at": int(_t.time()),
            "status": "in_progress",
            "background": bool(body.get("background")),
            "model": body.get("model", self.model_name),
            "instructions": body.get("instructions"),
            "previous_response_id": body.get("previous_response_id"),
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
            "max_output_tokens": body.get("max_output_tokens"),
            "parallel_tool_calls": True,
            "tool_choice": "auto",
            "tools": [],
            "truncation": "disabled",
            "output": [],
            "usage": None,
            "error": None,
            "incomplete_details": None,
            "metadata": body.get("metadata"),
            "_messages": messages,
        }

    async def _run_response(self, resp_id: str, prompt,
                            params) -> None:
        rec = self._responses_store()[resp_id]
        try:
            final = None
            async for out in self.llm.generate(prompt, params, resp_id):
                final = out
            c = final.outputs[0]
            text = c.text
            msg: dict[str, Any] = {
                "id": f"msg_{uuid.uuid4().hex[:24]}",
                "type": "message",
                "role": "assistant",
                "status": "completed",
                "content": [{"type": "output_text", "text": text,
                             "annotations": []}],
            }
            if self.reasoning_parser is not None:
                reasoning, stripped = self.reasoning_parser.split(text)
                if reasoning:
                    rec["output"].append({
                        "id": f"rs_{uuid.uuid4().hex[:24]}",
                        "type": "reasoning",
                        "summary": [],
                        "content": [{"type": "reasoning_text",
                                     "text": reasoning}],
                    })
                    msg["content"][0]["text"] = stripped
            rec["output"].append(msg)
            n_in = len(final.prompt_token_ids or [])
            n_out = len(c.token_ids or [])
            rec["usage"] = {
                "input_tokens": n_in,
                "output_tokens": n_out,
                "total_tokens": n_in + n_out,
                "input_tokens_details": {"cached_tokens": 0},
                "output_tokens_details": {"reasoning_tokens": 0},
            }
            rec["status"] = "completed"
            rec["_messages"] = rec["_messages"] + [{
                "role": "assistant",
                "content": msg["content"][0]["text"],
            }]
        except asyncio.CancelledError:
            rec["status"] = "cancelled"
            raise
        except Exception as e:  # surfaced via GET
            rec["status"] = "failed"
            rec["error"] = {"code": "server_error", "message": str(e)}
        finally:
            self._response_tasks.pop(resp_id, None)

    @staticmethod
    def _response_public(rec: dict) -> dict:
        return {k: v for k, v in rec.items() if not k.startswith("_")}

    async def responses_create(self,
                               request: web.Request) -> web.StreamResponse:
        body = await request.json()
        if body.get("input") is None:
            return _err("missing 'input'")
        if self.llm.tokenizer is None:
            return _err("server has no tokenizer", 400)
        try:
            prompt, messages = self._render_response_input(body)
        except KeyError as e:
            return _err(f"previous response not found: {e}", 404)
        params = SamplingParams(
            temperature=body.get("temperature", 1.0),
            top_p=body.get("top_p", 1.0),
            max_tokens=body.get("max_output_tokens") or 256,
        )
        resp_id = f"resp_{uuid.uuid4().hex[:24]}"
        rec = self._response_record(resp_id, body, messages)
        self._responses_store()[resp_id] = rec
        if body.get("stream"):
            return await self._stream_response(request, rec, prompt,
                                               params)
        task = asyncio.ensure_future(
            self._run_response(resp_id, prompt, params))
        self._response_tasks[resp_id] = task
        if body.get("background"):
            # queued/in_progress immediately; poll via GET.
            return web.json_response(self._response_public(rec))
        await asyncio.shield(task)
        return web.json_response(self._response_public(rec))

    async def _stream_response(self, request, rec: dict, prompt,
                               params) -> web.StreamResponse:
        """SSE event stream (ref: responses/api_router.py
        _convert_stream_to_sse_events — ``event: <type>`` +
        ``data: <json>`` frames; the reference event sequence
        created -> output_item.added -> content_part.added ->
        output_text.delta* -> output_text.done -> content_part.done ->
        output_item.done -> completed)."""
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)
        seq = 0

        async def emit(etype: str, data: dict) -> None:
            nonlocal seq
            data = dict(data, type=etype, sequence_number=seq)
            seq += 1
            await resp.write(
                f"event: {etype}\ndata: {json.dumps(data)}\n\n".encode())

        msg_id = f"msg_{uuid.uuid4().hex[:24]}"
        await emit("response.created",
                   {"response": self._response_public(rec)})
        await emit("response.output_item.added", {
            "output_index": 0,
            "item": {"id": msg_id, "type": "message",
                     "role": "assistant", "status": "in_progress",
                     "content": []},
        })
        await emit("response.content_part.added", {
            "item_id": msg_id, "output_index": 0, "content_index": 0,
            "part": {"type": "output_text", "text": "",
                     "annotations": []},
        })
        text = ""
        final = None
        try:
            async for out in self.llm.generate(prompt, params,
                                               rec["id"]):
                final = out
                full = out.outputs[0].text or ""
                if len(full) > len(text):
                    await emit("response.output_text.delta", {
                        "item_id": msg_id, "output_index": 0,
                        "content_index": 0, "delta": full[len(text):],
                    })
                    text = full
        except asyncio.CancelledError:
            rec["status"] = "cancelled"
            raise
        await emit("response.output_text.done", {
            "item_id": msg_id, "output_index": 0, "content_index": 0,
            "text": text,
        })
        msg = {"id": msg_id, "type": "message", "role": "assistant",
               "status": "completed",
               "content": [{"type": "output_text", "text": text,
                            "annotations": []}]}
        await emit("response.output_item.done",
                   {"output_index": 0, "item": msg})
        rec["output"].append(msg)
        rec["status"] = "completed"
        if final is not None:
            n_in = len(final.prompt_token_ids or [])
            n_out = len(final.outputs[0].token_ids or [])
            rec["usage"] = {
                "input_tokens": n_in, "output_tokens": n_out,
                "total_tokens": n_in + n_out,
                "input_tokens_details": {"cached_tokens": 0},
                "output_tokens_details": {"reasoning_tokens": 0},
            }
        rec["_messages"] = rec["_messages"] + [
            {"role": "assistant", "content": text}]
        await emit("response.completed",
                   {"response": self._response_public(rec)})
        await resp.write_eof()
        return resp

    async def responses_get(self, request: web.Request) -> web.Response:
        rec = self._responses_store().get(
            request.match_info["response_id"])
        if rec is None:
            return _err("response not found", 404)
        return web.json_response(self._response_public(rec))

    async def responses_cancel(self,
                               request: web.Request) -> web.Response:
        resp_id = request.match_info["response_id"]
        rec = self._responses_store().get(resp_id)
        if rec is None:
            return _err("response not found", 404)
        task = self._response_tasks.get(resp_id)
        if task is not None and not task.done():
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, Exception):
                pass
            rec["status"] = "cancelled"
        return web.json_response(self._response_public(rec))

    async def chat_completions(self,
                               request: web.Request) -> web.StreamResponse:
        body = await request.json()
        messages = body.get("messages")
        if not messages:
            return _err("missing 'messages'")
        tok = self.llm.tokenizer
        if tok is None:
            return _err("server has no tokenizer; use /v1/completions "
                        "with token ids", 400)
        tools = body.get("tools")
        try:
            kw = {"tools": tools} if tools else {}
            prompt = tok.apply_chat_template(messages,
                                             add_generation_prompt=True,
                                             **kw)
        except Exception:
            # No chat template: simple role-prefixed fallback.
            prompt = "".join(f"{m['role']}: {m['content']}\n"
                             for m in messages) + "assistant:"
        params = _sampling_params_from(body)
        lora = self._route_model(body)
        req_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        if body.get("stream"):
            return await self._stream(request, req_id, prompt, params,
                                      chat=True, lora_name=lora)
        return await self._complete(req_id, prompt, params, chat=True,
                                    lora_name=lora)

    # -- impl ---------------------------------------------------------
    async def _complete(self, req_id: str, prompt, params: SamplingParams,
                        chat: bool, lora_name: Optional[str] = None,
                        echo: bool = False) -> web.Response:
        final = None
        async for out in self.llm.generate(prompt, params, req_id,
                                           lora_name=lora_name):
            final = out
        assert final is not None
        c = final.outputs[0]
        if chat:
            message: dict[str, Any] = {"role": "assistant"}
            finish = c.finish_reason
            text = c.text
            if self.reasoning_parser is not None:
                reasoning, text = self.reasoning_parser.split(text)
                if reasoning:
                    message["reasoning_content"] = reasoning
            if self.tool_parser is not None:
                parsed = self.tool_parser.extract(text or "")
                if parsed.tools_called:
                    message["tool_calls"] = [
                        t.to_openai() for t in parsed.tool_calls
                    ]
                    text = parsed.content
                    finish = "tool_calls"
            message["content"] = text
            payload = {
                "id": req_id,
                "object": "chat.completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "message": message,
                    "finish_reason": finish,
                }],
                "usage": _usage(final),
            }
        else:
            choice = {
                "index": 0,
                "text": (final.prompt or "") + c.text if echo else c.text,
                "finish_reason": c.finish_reason,
            }
            lp = _logprobs_block(final, c, echo)
            if lp is not None:
                choice["logprobs"] = lp
            payload = {
                "id": req_id,
                "object": "text_completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [choice],
                "usage": _usage(final),
            }
        return web.json_response(payload)

    async def _best_of(self, req_id: str, prompt,
                       params: SamplingParams, best_of: int,
                       lora_name: Optional[str] = None,
                       echo: bool = False) -> web.Response:
        """OpenAI best_of: sample best_of candidates, return the one
        with the highest cumulative logprob (ref analog: the v0
        best_of semantics; the v1 reference runs candidates as
        parallel-sampling fan-out)."""
        import dataclasses
        want_lp = params.logprobs
        results = []
        for i in range(best_of):
            p_i = dataclasses.replace(
                params,
                logprobs=max(want_lp or 0, 1),
                seed=(params.seed + i if params.seed is not None
                      else None))
            final = None
            async for out in self.llm.generate(
                    prompt, p_i, f"{req_id}-bo{i}",
                    lora_name=lora_name):
                final = out
            results.append(final)
        best = max(results,
                   key=lambda r: r.outputs[0].cumulative_logprob or
                   float("-inf"))
        c = best.outputs[0]
        choice = {
            "index": 0,
            "text": (best.prompt or "") + c.text if echo else c.text,
            "finish_reason": c.finish_reason,
        }
        if want_lp is not None:
            lp = _logprobs_block(best, c, echo)
            if lp is not None:
                choice["logprobs"] = lp
        return web.json_response({
            "id": req_id,
            "object": "text_completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": [choice],
            "usage": _usage(best),
        })

    async def _stream(self, request: web.Request, req_id: str, prompt,
                      params: SamplingParams, chat: bool,
                      lora_name: Optional[str] = None,
                      echo: bool = False) -> web.StreamResponse:
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        sent_text = 0
        obj = "chat.completion.chunk" if chat else "text_completion"
        # Streaming post-processing state (chat only): the reasoning
        # parser splits deltas at the think boundary; the tool parser
        # holds back from the first possible tool-call marker and the
        # calls go out structured in the final frame.
        content_buf = ""
        tool_sent = 0
        first_chunk = True

        async def emit(choice: dict) -> None:
            frame = {
                "id": req_id,
                "object": obj,
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [choice],
            }
            await resp.write(f"data: {json.dumps(frame)}\n\n".encode())

        def chat_delta(delta: dict, finish=None) -> dict:
            nonlocal first_chunk
            if first_chunk:
                delta = {"role": "assistant", **delta}
                first_chunk = False
            return {"index": 0, "delta": delta, "finish_reason": finish}

        if echo and not chat and isinstance(prompt, str):
            await emit({"index": 0, "text": prompt,
                        "finish_reason": None})
        try:
            async for out in self.llm.generate(prompt, params, req_id,
                                               lora_name=lora_name):
                c = out.outputs[0]
                if not chat:
                    delta = c.text[sent_text:]
                    sent_text = len(c.text)
                    if not delta and not out.finished:
                        continue
                    await emit({
                        "index": 0,
                        "text": delta,
                        "finish_reason":
                        c.finish_reason if out.finished else None,
                    })
                    continue
                # chat: reasoning split, then tool-call hold-back.
                if self.reasoning_parser is not None:
                    r_delta, c_delta, sent_text = \
                        self.reasoning_parser.stream_delta(c.text,
                                                           sent_text)
                    if r_delta:
                        await emit(chat_delta(
                            {"reasoning_content": r_delta}))
                else:
                    c_delta = c.text[sent_text:]
                    sent_text = len(c.text)
                content_buf += c_delta
                if self.tool_parser is not None:
                    c_delta, tool_sent = self.tool_parser.stream_new_text(
                        content_buf, tool_sent)
                if c_delta:
                    await emit(chat_delta({"content": c_delta}))
                if out.finished:
                    finish = c.finish_reason
                    final_delta: dict = {}
                    if self.tool_parser is not None:
                        parsed = self.tool_parser.extract(content_buf)
                        if parsed.tools_called:
                            finish = "tool_calls"
                            final_delta["tool_calls"] = [{
                                **t.to_openai(), "index": i
                            } for i, t in enumerate(parsed.tool_calls)]
                    await emit(chat_delta(final_delta, finish))
            await resp.write(b"data: [DONE]\n\n")
        except ConnectionResetError:
            await self.llm.abort(req_id)
        return resp


def _usage(out) -> dict:
    n_prompt = len(out.prompt_token_ids)
    n_out = len(out.outputs[0].token_ids)
    return {
        "prompt_tokens": n_prompt,
        "completion_tokens": n_out,
        "total_tokens": n_prompt + n_out,
    }


def _err(msg: str, status: int = 400) -> web.Response:
    return web.json_response(
        {"error": {"message": msg, "type": "invalid_request_error"}},
        status=status)


async def serve(async_llm: AsyncLLM, host: str = "0.0.0.0",
                port: int = 8000, model_name: str = "vllm-tpu-model",
                lora_modules: Optional[dict[str, str]] = None,
                tool_parser: Optional[str] = None,
                reasoning_parser: Optional[str] = None):
    server = OpenAIServer(async_llm, model_name, lora_modules,
                          tool_parser, reasoning_parser)
    app = server.build_app()
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    logger.info("OpenAI server listening on %s:%d", host, port)
    return runner
