"""Incremental detokenization with stop-string scanning.

Ref analog: vllm/v1/engine/detokenizer.py (IncrementalDetokenizer:31).
Streaming decode can't just decode each token independently (BPE merges
and multi-byte UTF-8 straddle token boundaries); the standard two-offset
algorithm decodes a sliding window and only emits text once it stops
changing.
"""

from __future__ import annotations

from typing import Optional


class IncrementalDetokenizer:

    def __init__(self, tokenizer, prompt_token_ids: list[int],
                 stop: list[str], include_stop_str_in_output: bool,
                 skip_special_tokens: bool = True) -> None:
        self.tokenizer = tokenizer
        self.stop = stop
        self.include_stop = include_stop_str_in_output
        self.skip_special = skip_special_tokens
        # Window anchored a few tokens back into the prompt so the
        # first output token merges correctly with prompt context.
        self.token_ids: list[int] = list(prompt_token_ids)
        n = len(self.token_ids)
        self.prefix_offset = max(n - 6, 0)
        self.read_offset = n
        self.output_text = ""
        # longest stop string bounds how much emitted text we must
        # hold back to avoid streaming a partial stop string
        self.stop_buffer = max((len(s) for s in stop), default=0)

    def update(self, new_token_ids: list[int]) -> Optional[str]:
        """Feed tokens; returns the stop string hit, else None."""
        for tok in new_token_ids:
            self.token_ids.append(tok)
            prefix = self.tokenizer.decode(
                self.token_ids[self.prefix_offset:self.read_offset],
                skip_special_tokens=self.skip_special)
            full = self.tokenizer.decode(
                self.token_ids[self.prefix_offset:],
                skip_special_tokens=self.skip_special)
            if len(full) > len(prefix) and not full.endswith("�"):
                self.output_text += full[len(prefix):]
                self.prefix_offset = self.read_offset
                self.read_offset = len(self.token_ids)

        # Stop-string scan over the tail (a stop string may span
        # multiple tokens; scan window = buffer + new text).
        if self.stop:
            for s in self.stop:
                idx = self.output_text.find(
                    s, max(0, len(self.output_text) - self.stop_buffer -
                           len(s) - 8))
                if idx != -1:
                    self.output_text = self.output_text[:idx + (
                        len(s) if self.include_stop else 0)]
                    return s
        return None

    def get_next_output_text(self, buffered: bool, finished: bool) -> str:
        """Emitted-so-far text; when streaming (buffered) holds back
        stop_buffer chars in case a stop string is forming."""
        if finished or not buffered or not self.stop_buffer:
            return self.output_text
        return self.output_text[:len(self.output_text) - self.stop_buffer]
