"""Tool-call and reasoning parsers for chat model output.

Ref analog: vllm/tool_parsers/ (abstract_tool_parser.py ToolParser +
~40 model-specific parsers) and vllm/reasoning/ (abs_reasoning_parsers
ReasoningParser + think-token parsers). This package implements the
registry plus the dominant wire formats; model families that share a
format alias to it (as in the reference).

Non-streaming: ``parse(text) -> (content, [ToolCall])``.
Streaming: a stateful ``stream(delta) -> StreamDelta`` that holds back
text from the moment a tool-call start marker could be forming and
emits structured tool-call deltas once parseable.
"""

from vllm_tpu.parsers.reasoning import (ReasoningParser,
                                        get_reasoning_parser,
                                        reasoning_parser_names)
from vllm_tpu.parsers.tools import (ExtractedToolCalls, ToolCall,
                                    ToolParser, get_tool_parser,
                                    tool_parser_names)

__all__ = [
    "ExtractedToolCalls",
    "ReasoningParser",
    "ToolCall",
    "ToolParser",
    "get_reasoning_parser",
    "get_tool_parser",
    "reasoning_parser_names",
    "tool_parser_names",
]
