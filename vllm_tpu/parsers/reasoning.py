"""Reasoning-content parsers: split thinking from the final answer.

Ref analog: vllm/reasoning/abs_reasoning_parsers.py (ReasoningParser
ABC + registry) and basic_parsers.py BaseThinkingReasoningParser —
start/end token pairs (``<think>...</think>`` et al). Model families
sharing delimiters alias onto one implementation, as the reference
does (deepseek_r1, qwen3, glm4, hunyuan, ...).

Two modes:
- ``split(text)`` -> (reasoning_content, content) for complete output
- ``stream_delta(full_text, sent)`` -> (reasoning_delta, content_delta,
  new_sent) for SSE streaming, tracking the delimiter boundary
  incrementally.

Some models (deepseek-r1) open thinking implicitly: the output starts
inside the think block with no start token; ``implicit_start`` covers
that.
"""

from __future__ import annotations

from typing import Optional


class ReasoningParser:
    start_token = "<think>"
    end_token = "</think>"
    # Treat output as starting inside the reasoning block even without
    # the start token (deepseek_r1_reasoning_parser.py behavior).
    implicit_start = False

    def split(self, text: str) -> tuple[Optional[str], Optional[str]]:
        """-> (reasoning_content, content)."""
        start, end = self.start_token, self.end_token
        if end not in text:
            if self.implicit_start or text.startswith(start):
                body = text[len(start):] if text.startswith(start) else text
                return body or None, None
            return None, text or None
        head, _, tail = text.partition(end)
        if head.startswith(start):
            head = head[len(start):]
        elif start in head:
            pre, _, head = head.partition(start)
            tail = pre + tail  # prose before the think block
        elif not self.implicit_start:
            return None, text or None
        return head or None, (tail.lstrip("\n") or None)

    def stream_delta(self, full_text: str,
                     sent: int) -> tuple[str, str, int]:
        """-> (reasoning_delta, content_delta, new_sent). ``sent`` is
        the char offset already consumed. Deltas never split the
        delimiter tokens across frames: a partial delimiter at the
        tail is held back until it resolves."""
        start, end = self.start_token, self.end_token
        text = full_text
        end_i = text.find(end)
        in_think = self.implicit_start or text.startswith(start)
        think_from = (len(start) if text.startswith(start) else 0)
        if not in_think:
            if start.startswith(text):
                # could still become the start token: hold everything
                return "", "", sent
            return "", text[sent:], len(text)
        # Reasoning region: [think_from, end_i); content after the end
        # token.
        if end_i == -1:
            lo = max(sent, think_from)
            safe = self._hold_partial(text, (end, ))
            delta = text[lo:safe] if safe > lo else ""
            return delta, "", max(sent, safe)
        r_delta = text[max(sent, think_from):end_i] if sent < end_i else ""
        c_lo = max(sent, end_i + len(end))
        content = text[c_lo:].lstrip("\n") if c_lo <= len(text) else ""
        if sent > end_i:  # already past the boundary: plain content
            content = text[sent:]
        return r_delta, content, len(text)

    def _hold_partial(self, text: str, markers: tuple[str, ...]) -> int:
        safe = len(text)
        for m in markers:
            for k in range(len(m) - 1, 0, -1):
                if text.endswith(m[:k]):
                    safe = min(safe, len(text) - k)
                    break
        return safe


class DeepSeekR1ReasoningParser(ReasoningParser):
    implicit_start = True


class Qwen3ReasoningParser(ReasoningParser):
    implicit_start = False


class GptOssReasoningParser(ReasoningParser):
    """Harmony-style analysis channel markers
    (gptoss_reasoning_parser.py)."""
    start_token = "<|channel|>analysis<|message|>"
    end_token = "<|end|><|start|>assistant<|channel|>final<|message|>"
    implicit_start = False


_REASONING_PARSERS: dict[str, type[ReasoningParser]] = {
    "deepseek_r1": DeepSeekR1ReasoningParser,
    "qwen3": Qwen3ReasoningParser,
    "glm4": Qwen3ReasoningParser,
    "hunyuan": Qwen3ReasoningParser,
    "gptoss": GptOssReasoningParser,
}


def get_reasoning_parser(name: str) -> ReasoningParser:
    try:
        return _REASONING_PARSERS[name]()
    except KeyError:
        raise ValueError(
            f"unknown reasoning parser {name!r}; "
            f"have {sorted(_REASONING_PARSERS)}") from None


def reasoning_parser_names() -> list[str]:
    return sorted(_REASONING_PARSERS)
