"""Anthropic Messages API frontend (POST /v1/messages).

Ref analog: vllm/entrypoints/anthropic/ (Messages API served from the
same engine as the OpenAI routes). Maps Messages requests onto the
chat template + SamplingParams, and emits the Messages response /
SSE event stream (message_start, content_block_delta, message_delta,
message_stop).
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, Optional

from aiohttp import web

from vllm_tpu.sample.params import SamplingParams


def _params_from(body: dict[str, Any]) -> SamplingParams:
    if "max_tokens" not in body:
        raise ValueError("max_tokens is required")
    return SamplingParams(
        max_tokens=int(body["max_tokens"]),
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k") or 0),  # 0 = disabled
        stop=body.get("stop_sequences"),
    )


def _stop_reason(finish: Optional[str], stopped_on_string: bool) -> str:
    if finish == "length":
        return "max_tokens"
    if stopped_on_string:
        return "stop_sequence"
    return "end_turn"


def _messages_to_chat(body: dict[str, Any]) -> list[dict[str, str]]:
    """Messages-API content blocks -> chat-template messages."""
    msgs: list[dict[str, str]] = []
    system = body.get("system")
    if system:
        if isinstance(system, list):  # content blocks
            system = "".join(b.get("text", "") for b in system)
        msgs.append({"role": "system", "content": system})
    for m in body.get("messages", []):
        content = m.get("content")
        if isinstance(content, list):
            content = "".join(
                b.get("text", "") for b in content
                if b.get("type") == "text")
        msgs.append({"role": m["role"], "content": content})
    return msgs


class AnthropicRoutes:
    """Registers /v1/messages on an existing server app; shares the
    AsyncLLM + tokenizer of the OpenAI routes."""

    def __init__(self, server) -> None:
        self.server = server

    def register(self, app: web.Application) -> None:
        app.router.add_post("/v1/messages", self.messages)

    async def messages(self, request: web.Request) -> web.StreamResponse:
        server = self.server
        body = await request.json()
        if not body.get("messages"):
            return _anthropic_err("invalid_request_error",
                                  "messages: field required")
        tok = server.llm.tokenizer
        if tok is None:
            return _anthropic_err("invalid_request_error",
                                  "server has no tokenizer")
        try:
            params = _params_from(body)
        except (ValueError, TypeError) as e:
            return _anthropic_err("invalid_request_error", str(e))
        msgs = _messages_to_chat(body)
        try:
            prompt = tok.apply_chat_template(msgs,
                                             add_generation_prompt=True)
        except Exception:
            prompt = "".join(f"{m['role']}: {m['content']}\n"
                             for m in msgs) + "assistant:"
        req_id = f"msg_{uuid.uuid4().hex[:24]}"
        model = body.get("model") or server.model_name
        if body.get("stream"):
            return await self._stream(request, req_id, model, prompt,
                                      params)
        final = None
        async for out in server.llm.generate(prompt, params, req_id):
            final = out
        assert final is not None
        c = final.outputs[0]
        # stop_reason carries the matched stop string (str) when a
        # stop_sequence fired, a token id (int) for EOS.
        stop_seq = c.stop_reason if isinstance(c.stop_reason, str) else None
        payload = {
            "id": req_id,
            "type": "message",
            "role": "assistant",
            "model": model,
            "content": [{"type": "text", "text": c.text}],
            "stop_reason": _stop_reason(c.finish_reason,
                                        stop_seq is not None),
            "stop_sequence": stop_seq,
            "usage": {
                "input_tokens": len(final.prompt_token_ids),
                "output_tokens": len(c.token_ids),
            },
        }
        return web.json_response(payload)

    async def _stream(self, request: web.Request, req_id: str,
                      model: str, prompt,
                      params: SamplingParams) -> web.StreamResponse:
        server = self.server
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)

        async def emit(event: str, data: dict) -> None:
            await resp.write(
                (f"event: {event}\n"
                 f"data: {json.dumps(data)}\n\n").encode())

        await emit(
            "message_start", {
                "type": "message_start",
                "message": {
                    "id": req_id,
                    "type": "message",
                    "role": "assistant",
                    "model": model,
                    "content": [],
                    "stop_reason": None,
                    "usage": {"input_tokens": 0, "output_tokens": 0},
                },
            })
        await emit(
            "content_block_start", {
                "type": "content_block_start",
                "index": 0,
                "content_block": {"type": "text", "text": ""},
            })
        sent = 0
        final = None
        async for out in server.llm.generate(prompt, params, req_id):
            final = out
            text = out.outputs[0].text
            if len(text) > sent:
                await emit(
                    "content_block_delta", {
                        "type": "content_block_delta",
                        "index": 0,
                        "delta": {
                            "type": "text_delta",
                            "text": text[sent:],
                        },
                    })
                sent = len(text)
        await emit("content_block_stop", {
            "type": "content_block_stop",
            "index": 0,
        })
        c = final.outputs[0]
        stop_seq = c.stop_reason if isinstance(c.stop_reason, str) else None
        await emit(
            "message_delta", {
                "type": "message_delta",
                "delta": {
                    "stop_reason": _stop_reason(c.finish_reason,
                                                stop_seq is not None),
                    "stop_sequence": stop_seq,
                },
                "usage": {"output_tokens": len(c.token_ids)},
            })
        await emit("message_stop", {"type": "message_stop"})
        await resp.write_eof()
        return resp


def _anthropic_err(err_type: str, msg: str,
                   status: int = 400) -> web.Response:
    return web.json_response(
        {"type": "error", "error": {"type": err_type, "message": msg}},
        status=status)
