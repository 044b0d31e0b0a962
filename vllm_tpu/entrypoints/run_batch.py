"""Offline OpenAI batch-file runner.

Ref analog: vllm/entrypoints/openai/run_batch.py — reads an OpenAI
batch input file (JSONL; one ``{custom_id, method, url, body}`` per
line), runs every request through the engine concurrently, and writes
the batch output file (JSONL of ``{id, custom_id, response, error}``).
Supported urls: /v1/chat/completions, /v1/completions (the reference
supports chat + embeddings; completions is a superset convenience).
"""

from __future__ import annotations

import json
import uuid
from typing import Any, Optional

from vllm_tpu.utils import init_logger

logger = init_logger(__name__)


async def run_batch(async_llm, input_path: str, output_path: str,
                    model_name: str = "vllm-tpu-model",
                    tool_parser: Optional[str] = None,
                    reasoning_parser: Optional[str] = None) -> dict:
    """Run every line of the batch file; returns counts."""
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_tpu.entrypoints.openai_server import OpenAIServer

    server = OpenAIServer(async_llm, model_name,
                          tool_parser=tool_parser,
                          reasoning_parser=reasoning_parser)
    app = server.build_app()
    ok = failed = 0
    results: list[dict[str, Any]] = []

    with open(input_path) as f:
        lines = [json.loads(ln) for ln in f if ln.strip()]

    # In-process HTTP keeps one code path with the live server (same
    # validation, parsers, streaming rules) with no socket exposure.
    async with TestClient(TestServer(app)) as client:
        import asyncio

        async def one(line: dict) -> dict:
            nonlocal ok, failed
            out = {
                "id": f"vllm_tpu-{uuid.uuid4().hex[:24]}",
                "custom_id": line.get("custom_id"),
                "response": None,
                "error": None,
            }
            url = line.get("url", "")
            body = dict(line.get("body") or {})
            body.pop("stream", None)  # batch is non-streaming
            if (line.get("method", "POST") != "POST" or url not in
                    ("/v1/chat/completions", "/v1/completions")):
                out["error"] = f"unsupported method/url: {url}"
                failed += 1
                return out
            resp = await client.post(url, json=body)
            payload = await resp.json()
            out["response"] = {
                "status_code": resp.status,
                "request_id": f"vllm_tpu-batch-{uuid.uuid4().hex[:24]}",
                "body": payload,
            }
            if resp.status == 200:
                ok += 1
            else:
                failed += 1
            return out

        results = list(await asyncio.gather(*[one(ln) for ln in lines]))

    with open(output_path, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    logger.info("batch done: %d ok, %d failed -> %s", ok, failed,
                output_path)
    return {"ok": ok, "failed": failed, "total": len(lines)}
