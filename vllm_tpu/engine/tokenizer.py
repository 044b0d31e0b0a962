"""Tokenizer wrapper (HF transformers backend).

Ref analog: vllm/tokenizers/ registry — we keep one backend now and the
same narrow interface so others (tiktoken-style, mistral) can slot in.
"""

from __future__ import annotations

from typing import Optional


class Tokenizer:

    def __init__(self, model_path: str, **kw) -> None:
        from transformers import AutoTokenizer
        self._tok = AutoTokenizer.from_pretrained(model_path, **kw)

    @property
    def eos_token_id(self) -> Optional[int]:
        return self._tok.eos_token_id

    @property
    def vocab_size(self) -> int:
        return len(self._tok)

    def __len__(self) -> int:
        return len(self._tok)

    @property
    def all_special_ids(self) -> list[int]:
        return self._tok.all_special_ids

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        return self._tok.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, token_ids: list[int],
               skip_special_tokens: bool = True) -> str:
        return self._tok.decode(token_ids,
                                skip_special_tokens=skip_special_tokens)

    def convert_ids_to_tokens(self, ids: list[int]) -> list[str]:
        return self._tok.convert_ids_to_tokens(ids)

    def apply_chat_template(self, messages, **kw) -> str:
        return self._tok.apply_chat_template(messages, tokenize=False, **kw)
