"""Tool-call and reasoning parser tests.

Ref analog: tests/tool_use/ and tests/reasoning/ in the reference —
format fixtures checked against extract + streaming hold-back."""

import json

import pytest

from vllm_tpu.parsers import (get_reasoning_parser, get_tool_parser,
                              reasoning_parser_names, tool_parser_names)


def test_registries():
    assert "hermes" in tool_parser_names()
    assert "deepseek_r1" in reasoning_parser_names()
    with pytest.raises(ValueError):
        get_tool_parser("nope")
    with pytest.raises(ValueError):
        get_reasoning_parser("nope")


def test_hermes_extract():
    p = get_tool_parser("hermes")
    text = ('Let me check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "SF"}}\n</tool_call>')
    out = p.extract(text)
    assert out.tools_called
    assert out.content == "Let me check."
    assert out.tool_calls[0].name == "get_weather"
    assert json.loads(out.tool_calls[0].arguments) == {"city": "SF"}
    # multiple calls
    out = p.extract('<tool_call>{"name": "a", "arguments": {}}'
                    '</tool_call><tool_call>{"name": "b", '
                    '"arguments": {"x": 1}}</tool_call>')
    assert [t.name for t in out.tool_calls] == ["a", "b"]
    assert out.content is None
    # no tool call
    out = p.extract("just prose")
    assert not out.tools_called and out.content == "just prose"


def test_llama3_json_extract():
    p = get_tool_parser("llama3_json")
    out = p.extract('{"name": "search", "parameters": {"q": "tpu"}}')
    assert out.tools_called and out.content is None
    assert out.tool_calls[0].name == "search"
    assert json.loads(out.tool_calls[0].arguments) == {"q": "tpu"}
    # parallel, ;-separated
    out = p.extract('{"name": "a", "parameters": {}}; '
                    '{"name": "b", "parameters": {"x": 2}}')
    assert [t.name for t in out.tool_calls] == ["a", "b"]
    assert not p.extract("plain text").tools_called


def test_mistral_extract():
    p = get_tool_parser("mistral")
    out = p.extract('[TOOL_CALLS] [{"name": "f", "arguments": '
                    '{"k": "v"}}]')
    assert out.tools_called
    assert out.tool_calls[0].name == "f"
    assert len(out.tool_calls[0].id) == 9
    out = p.extract("Sure. [TOOL_CALLS] [{\"name\": \"g\", "
                    "\"arguments\": {}}]")
    assert out.content == "Sure." and out.tool_calls[0].name == "g"


def test_pythonic_extract():
    p = get_tool_parser("pythonic")
    out = p.extract('[get_weather(city="SF"), search(q=1)]')
    assert [t.name for t in out.tool_calls] == ["get_weather", "search"]
    assert json.loads(out.tool_calls[0].arguments) == {"city": "SF"}
    assert not p.extract("[1, 2, 3]").tools_called
    assert not p.extract("not a list").tools_called


def test_truncated_json_is_tolerated():
    p = get_tool_parser("hermes")
    # generation cut off mid-block: no crash, no bogus call
    out = p.extract('<tool_call>{"name": "x", "argu')
    assert not out.tools_called


def test_tool_stream_holdback():
    p = get_tool_parser("hermes")
    full = 'Answer: <tool_call>{"name": "f", "arguments": {}}</tool_call>'
    sent = 0
    emitted = ""
    # feed char by char: prose streams out, tool payload never does
    for i in range(1, len(full) + 1):
        delta, sent = p.stream_new_text(full[:i], sent)
        emitted += delta
    assert emitted == "Answer: "
    # a trailing '<' is held (could grow into '<tool_call>') and
    # released once the next chars disprove the marker
    sent = 0
    delta, sent = p.stream_new_text("a <", sent)
    assert delta == "a "
    delta, sent = p.stream_new_text("a < b", sent)
    assert delta == "< b"


def test_reasoning_split_explicit():
    p = get_reasoning_parser("qwen3")
    r, c = p.split("<think>step 1</think>\nanswer")
    assert r == "step 1" and c == "answer"
    r, c = p.split("no think tokens")
    assert r is None and c == "no think tokens"
    # unterminated think: all reasoning, no content yet
    r, c = p.split("<think>still going")
    assert r == "still going" and c is None


def test_reasoning_split_implicit():
    p = get_reasoning_parser("deepseek_r1")
    # r1 starts inside the think block without the start token
    r, c = p.split("chain of thought</think>final")
    assert r == "chain of thought" and c == "final"
    r, c = p.split("no end token yet")
    assert r == "no end token yet" and c is None


def test_reasoning_stream():
    p = get_reasoning_parser("qwen3")
    full = "<think>abc</think>xyz"
    sent = 0
    r_all = c_all = ""
    for i in range(1, len(full) + 1):
        r, c, sent = p.stream_delta(full[:i], sent)
        r_all += r
        c_all += c
    assert r_all == "abc"
    assert c_all == "xyz"


def test_server_chat_tool_calls():
    """Wire-through: a canned engine output parses into the chat
    response (non-stream and stream)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from vllm_tpu.entrypoints.openai_server import OpenAIServer

    canned = ('<think>use the tool</think>\n<tool_call>{"name": "f", '
              '"arguments": {"a": 1}}</tool_call>')

    class FakeOut:

        def __init__(self, text, finished):
            class C:
                pass

            self.outputs = [C()]
            self.outputs[0].text = text
            self.outputs[0].finish_reason = "stop" if finished else None
            self.finished = finished
            self.prompt_token_ids = [1, 2]
            self.outputs[0].token_ids = [3]

    class FakeLLM:
        tokenizer = None
        lora_adapters = []

        async def generate(self, prompt, params, req_id, lora_name=None):
            for i in range(4, len(canned), 7):
                yield FakeOut(canned[:i], False)
            yield FakeOut(canned, True)

    class Tok:

        def apply_chat_template(self, messages, **kw):
            return "x"

    fake = FakeLLM()
    fake.tokenizer = Tok()
    server = OpenAIServer(fake, "m", tool_parser="hermes",
                          reasoning_parser="qwen3")

    async def main():
        app = server.build_app()
        async with TestClient(TestServer(app)) as client:
            r = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "hi"}]})
            data = await r.json()
            msg = data["choices"][0]["message"]
            assert msg["reasoning_content"] == "use the tool"
            assert msg["tool_calls"][0]["function"]["name"] == "f"
            assert data["choices"][0]["finish_reason"] == "tool_calls"
            # streaming: reasoning deltas come out; tool call in the
            # final frame; payload text never streamed as content
            r = await client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "user", "content": "hi"}],
                      "stream": True})
            raw = (await r.read()).decode()
            frames = [json.loads(l[6:]) for l in raw.splitlines()
                      if l.startswith("data: ") and l != "data: [DONE]"]
            reasoning = "".join(
                f["choices"][0]["delta"].get("reasoning_content", "")
                for f in frames)
            content = "".join(
                f["choices"][0]["delta"].get("content", "") or ""
                for f in frames)
            assert reasoning == "use the tool"
            assert "tool_call" not in content and '"name"' not in content
            last = frames[-1]["choices"][0]
            assert last["finish_reason"] == "tool_calls"
            assert last["delta"]["tool_calls"][0]["function"]["name"] == "f"

    asyncio.run(main())


# -- round 5: streaming edge cases (the places thin parsers rot — ref
# tool_parsers' streaming tests: partial JSON, multi-tool interleave,
# marker split across chunk boundaries) -------------------------------

def _stream_chars(parser, text):
    """Feed text one char at a time; return the streamed prose."""
    sent = 0
    out = []
    for i in range(1, len(text) + 1):
        delta, sent = parser.stream_new_text(text[:i], sent)
        out.append(delta)
    return "".join(out), sent


def test_stream_never_leaks_marker_split_across_chunks():
    from vllm_tpu.parsers.tools import get_tool_parser
    p = get_tool_parser("hermes")
    text = ('I will call a tool now <tool_call>{"name": "f", '
            '"arguments": {"x": 1}}</tool_call> done')
    prose, sent = _stream_chars(p, text)
    assert "<tool_call>" not in prose
    assert prose.startswith("I will call a tool now")
    # the held-back payload surfaces structured in the final parse
    parsed = p.extract(text)
    assert parsed.tools_called
    assert parsed.tool_calls[0].name == "f"


def test_stream_partial_marker_prefix_held_back():
    from vllm_tpu.parsers.tools import get_tool_parser
    p = get_tool_parser("hermes")
    # tail "<tool" could still grow into the marker: must be held
    delta, sent = p.stream_new_text("hello <tool", 0)
    assert delta == "hello "
    # ...but a tail that can't be a marker prefix flushes
    delta2, sent2 = p.stream_new_text("hello <tooting", sent)
    assert (("hello " + delta2).strip().startswith("hello <tooting"[:6])
            and "<tool_call>" not in delta2)
    assert sent2 == len("hello <tooting")


def test_multi_tool_interleave_with_prose():
    from vllm_tpu.parsers.tools import get_tool_parser
    p = get_tool_parser("hermes")
    text = ('first <tool_call>{"name": "a", "arguments": {}}'
            '</tool_call> middle <tool_call>{"name": "b", '
            '"arguments": {"k": "v"}}</tool_call> last')
    parsed = p.extract(text)
    assert [c.name for c in parsed.tool_calls] == ["a", "b"]
    assert "first" in (parsed.content or "")
    assert "middle" in (parsed.content or "")
    assert "last" in (parsed.content or "")


def test_truncated_generation_unclosed_tool_call():
    """max_tokens hit mid-payload: no crash, no half-JSON prose leak."""
    from vllm_tpu.parsers.tools import get_tool_parser
    p = get_tool_parser("hermes")
    text = 'ok <tool_call>{"name": "f", "arguments": {"x": 1'
    parsed = p.extract(text)
    assert not parsed.tools_called  # unclosed block is not a call
    prose, _ = _stream_chars(p, text)
    assert "{" not in prose  # payload never streamed as prose


def test_llama3_json_parallel_calls_and_trailing_junk():
    from vllm_tpu.parsers.tools import get_tool_parser
    p = get_tool_parser("llama3_json")
    parsed = p.extract('{"name": "a", "parameters": {"x": 1}}; '
                       '{"name": "b", "parameters": {}}')
    assert [c.name for c in parsed.tool_calls] == ["a", "b"]
    # plain prose stays prose
    assert not p.extract("just words").tools_called


def test_pythonic_multiple_calls_stream_holdback():
    from vllm_tpu.parsers.tools import get_tool_parser
    p = get_tool_parser("pythonic")
    text = '[f(x=1), g(y="s")]'
    parsed = p.extract(text)
    assert [c.name for c in parsed.tool_calls] == ["f", "g"]
    prose, _ = _stream_chars(p, text)
    assert prose == "" or "[" not in prose
