"""Anthropic Messages API frontend (ref analog:
vllm/entrypoints/anthropic/): non-streaming + SSE event stream +
validation errors, against a real AsyncLLM."""

import json

from tests.entrypoints.test_openai_server import (tokenizer,  # noqa: F401
                                                  with_client)


def test_messages_basic(tokenizer):  # noqa: F811
    async def t(client):
        r = await client.post("/v1/messages", json={
            "model": "tiny",
            "max_tokens": 8,
            "messages": [{"role": "user", "content": "hello there"}],
            "temperature": 0.0,
        })
        assert r.status == 200
        body = await r.json()
        assert body["type"] == "message"
        assert body["role"] == "assistant"
        assert body["content"][0]["type"] == "text"
        assert isinstance(body["content"][0]["text"], str)
        assert body["stop_reason"] in ("end_turn", "max_tokens")
        assert body["usage"]["output_tokens"] > 0
        assert body["usage"]["input_tokens"] > 0

    with_client(t, tokenizer)


def test_messages_content_blocks_and_system(tokenizer):  # noqa: F811
    async def t(client):
        r = await client.post("/v1/messages", json={
            "model": "tiny",
            "max_tokens": 4,
            "system": "be brief",
            "messages": [{
                "role": "user",
                "content": [{"type": "text", "text": "hi"}],
            }],
        })
        assert r.status == 200
        body = await r.json()
        assert body["stop_reason"] == "max_tokens"

    with_client(t, tokenizer)


def test_messages_stream_events(tokenizer):  # noqa: F811
    async def t(client):
        r = await client.post("/v1/messages", json={
            "model": "tiny",
            "max_tokens": 6,
            "temperature": 0.0,
            "messages": [{"role": "user", "content": "stream me"}],
            "stream": True,
        })
        assert r.status == 200
        raw = (await r.read()).decode()
        events = []
        for block in raw.strip().split("\n\n"):
            lines = dict(
                l.split(": ", 1) for l in block.splitlines() if ": " in l)
            events.append((lines["event"], json.loads(lines["data"])))
        kinds = [e[0] for e in events]
        assert kinds[0] == "message_start"
        assert kinds[1] == "content_block_start"
        assert kinds[-3:] == ["content_block_stop", "message_delta",
                              "message_stop"]
        text = "".join(d["delta"]["text"] for k, d in events
                       if k == "content_block_delta")
        assert isinstance(text, str)
        md = [d for k, d in events if k == "message_delta"][0]
        # EOS may fire before max_tokens; the count must be 1..6.
        assert 1 <= md["usage"]["output_tokens"] <= 6

    with_client(t, tokenizer)


def test_messages_validation_errors(tokenizer):  # noqa: F811
    async def t(client):
        r = await client.post("/v1/messages", json={
            "model": "tiny", "max_tokens": 4, "messages": [],
        })
        assert r.status == 400
        body = await r.json()
        assert body["type"] == "error"
        r = await client.post("/v1/messages", json={
            "model": "tiny",
            "messages": [{"role": "user", "content": "x"}],
        })
        assert r.status == 400  # max_tokens required

    with_client(t, tokenizer)
