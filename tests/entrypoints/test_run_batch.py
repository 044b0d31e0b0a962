"""Batch-file runner test: real engine, OpenAI batch JSONL in/out.

Ref analog: tests/entrypoints/openai/test_run_batch.py."""

import asyncio
import json


def test_run_batch(tmp_path, tokenizer=None):
    from tests.entrypoints.test_openai_server import make_async_llm
    from vllm_tpu.entrypoints.run_batch import run_batch

    lines = [
        {
            "custom_id": "r1",
            "method": "POST",
            "url": "/v1/completions",
            "body": {"prompt": [5, 6, 7], "max_tokens": 4,
                     "temperature": 0, "ignore_eos": True},
        },
        {
            "custom_id": "r2",
            "method": "POST",
            "url": "/v1/completions",
            "body": {"prompt": [8, 9], "max_tokens": 3,
                     "temperature": 0, "ignore_eos": True},
        },
        {
            "custom_id": "bad",
            "method": "POST",
            "url": "/v1/unsupported",
            "body": {},
        },
    ]
    inp = tmp_path / "in.jsonl"
    outp = tmp_path / "out.jsonl"
    inp.write_text("".join(json.dumps(l) + "\n" for l in lines))

    llm = make_async_llm()

    async def main():
        llm.start()
        return await run_batch(llm, str(inp), str(outp), "tiny")

    try:
        stats = asyncio.run(main())
    finally:
        llm.shutdown()

    assert stats == {"ok": 2, "failed": 1, "total": 3}
    outs = {o["custom_id"]: o
            for o in map(json.loads, outp.read_text().splitlines())}
    assert outs["r1"]["response"]["status_code"] == 200
    body = outs["r1"]["response"]["body"]
    assert body["usage"]["completion_tokens"] == 4
    assert outs["r2"]["response"]["body"]["usage"]["completion_tokens"] == 3
    assert outs["bad"]["error"] and outs["bad"]["response"] is None
