"""Tool-call parsers: model output text -> OpenAI tool_calls.

Ref analog: vllm/tool_parsers/abstract_tool_parser.py (ToolParser ABC +
ToolParserManager registry) and the format families:

- hermes_tool_parser.py      — ``<tool_call>{json}</tool_call>`` blocks
  (Hermes, Qwen2/3, many chat finetunes)
- llama_tool_parser.py       — bare ``{"name":..., "parameters":...}``
  JSON (Llama-3.1 JSON tool calling); ``;``-separated for parallel
- mistral_tool_parser.py     — ``[TOOL_CALLS] [{...}, ...]`` array
- llama4_pythonic_tool_parser.py — ``[f(a=1), g(b="x")]`` python calls

Parsers are pure text->struct (no tokenizer dependency): TPU-side
sampling already yields final text through the detokenizer, so parsing
stays host-side and engine-agnostic.
"""

from __future__ import annotations

import ast
import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded argument object
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}")

    def to_openai(self) -> dict:
        return {
            "id": self.id,
            "type": "function",
            "function": {"name": self.name, "arguments": self.arguments},
        }


@dataclass
class ExtractedToolCalls:
    content: Optional[str]  # non-tool prose (None if all tool calls)
    tool_calls: list[ToolCall] = field(default_factory=list)

    @property
    def tools_called(self) -> bool:
        return bool(self.tool_calls)


class ToolParser:
    """Base: subclass and implement extract(); register by name."""

    # Text that precedes tool-call payloads; streaming holds back
    # output once a prefix of any marker appears at the tail.
    start_markers: tuple[str, ...] = ()

    def extract(self, text: str) -> ExtractedToolCalls:
        raise NotImplementedError

    # -- streaming ----------------------------------------------------
    def stream_new_text(self, full_text: str,
                        sent: int) -> tuple[str, int]:
        """Given the accumulated text and chars already emitted,
        return (safe_delta, new_sent). Text beyond the first possible
        marker prefix is held back; tool payloads are never streamed
        as prose (final parse emits them structured)."""
        safe_end = len(full_text)
        for marker in self.start_markers:
            i = full_text.find(marker, sent)
            if i != -1:
                safe_end = min(safe_end, i)
                continue
            # A partial marker at the tail could still grow into one.
            for k in range(len(marker) - 1, 0, -1):
                if full_text.endswith(marker[:k]):
                    safe_end = min(safe_end, len(full_text) - k)
                    break
        safe_end = max(safe_end, sent)
        return full_text[sent:safe_end], safe_end


class HermesToolParser(ToolParser):
    """``<tool_call>{"name": ..., "arguments": {...}}</tool_call>``."""

    start_markers = ("<tool_call>", )
    _block = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for frag in self._block.findall(text):
            obj = _loads_lenient(frag)
            if obj is not None:
                calls.append(_call_from(obj))
        if not calls:
            return ExtractedToolCalls(text or None)
        content = self._block.sub("", text).replace("<tool_call>", "")
        content = content.strip() or None
        return ExtractedToolCalls(content, calls)


class Llama3JsonToolParser(ToolParser):
    """Bare JSON object(s): ``{"name": ..., "parameters": {...}}``;
    ``;``-separated for parallel calls (llama_tool_parser.py)."""

    start_markers = ('{"', "{\n")

    def extract(self, text: str) -> ExtractedToolCalls:
        stripped = text.strip()
        if stripped.startswith("<|python_tag|>"):
            stripped = stripped[len("<|python_tag|>"):]
        if not stripped.startswith("{"):
            return ExtractedToolCalls(text or None)
        calls = []
        for frag in stripped.split(";"):
            obj = _loads_lenient(frag.strip())
            if obj is None or "name" not in obj:
                return ExtractedToolCalls(text or None)
            calls.append(_call_from(obj))
        return ExtractedToolCalls(None, calls)


class MistralToolParser(ToolParser):
    """``[TOOL_CALLS] [{"name": ..., "arguments": {...}}, ...]``."""

    start_markers = ("[TOOL_CALLS]", )

    def extract(self, text: str) -> ExtractedToolCalls:
        if "[TOOL_CALLS]" not in text:
            return ExtractedToolCalls(text or None)
        content, _, payload = text.partition("[TOOL_CALLS]")
        arr = _loads_lenient(payload.strip())
        if not isinstance(arr, list):
            return ExtractedToolCalls(text or None)
        calls = [_call_from(o) for o in arr if isinstance(o, dict)]
        # Mistral ids are 9 alphanumerics.
        for c in calls:
            c.id = uuid.uuid4().hex[:9]
        return ExtractedToolCalls(content.strip() or None, calls)


class PythonicToolParser(ToolParser):
    """``[get_weather(city="SF"), search(q=1)]`` — python call syntax
    (llama4_pythonic_tool_parser.py)."""

    start_markers = ("[", )

    def extract(self, text: str) -> ExtractedToolCalls:
        stripped = text.strip()
        if stripped.startswith("<|python_start|>"):
            stripped = stripped[len("<|python_start|>"):]
            stripped = stripped.replace("<|python_end|>", "")
        if not (stripped.startswith("[") and stripped.endswith("]")):
            return ExtractedToolCalls(text or None)
        try:
            tree = ast.parse(stripped, mode="eval")
        except SyntaxError:
            return ExtractedToolCalls(text or None)
        if not isinstance(tree.body, ast.List):
            return ExtractedToolCalls(text or None)
        calls = []
        for node in tree.body.elts:
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)):
                return ExtractedToolCalls(text or None)
            try:
                args = {
                    kw.arg: ast.literal_eval(kw.value)
                    for kw in node.keywords
                }
            except ValueError:
                return ExtractedToolCalls(text or None)
            calls.append(ToolCall(node.func.id, json.dumps(args)))
        return ExtractedToolCalls(None, calls)


def _loads_lenient(frag: str):
    """JSON parse tolerating trailing junk (truncated generations)."""
    try:
        return json.loads(frag)
    except json.JSONDecodeError as e:
        if e.pos > 0:
            try:
                return json.loads(frag[:e.pos])
            except json.JSONDecodeError:
                return None
        return None


def _call_from(obj: dict) -> ToolCall:
    args = obj.get("arguments", obj.get("parameters", {}))
    if not isinstance(args, str):
        args = json.dumps(args)
    return ToolCall(str(obj.get("name", "")), args)


# Registry (ref analog: ToolParserManager.tool_parsers): aliases map
# model families sharing a format onto one implementation.
_TOOL_PARSERS: dict[str, type[ToolParser]] = {
    "hermes": HermesToolParser,
    "qwen": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "llama4_json": Llama3JsonToolParser,
    "mistral": MistralToolParser,
    "pythonic": PythonicToolParser,
    "llama4_pythonic": PythonicToolParser,
}


def get_tool_parser(name: str) -> ToolParser:
    try:
        return _TOOL_PARSERS[name]()
    except KeyError:
        raise ValueError(
            f"unknown tool parser {name!r}; have {sorted(_TOOL_PARSERS)}"
        ) from None


def tool_parser_names() -> list[str]:
    return sorted(_TOOL_PARSERS)
