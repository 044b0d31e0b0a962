"""Tokenizer registry: mode -> backend factory.

Ref analog: vllm/tokenizers/registry.py (HF / mistral / tiktoken-style
backends + OOT registration via entry points). Backends implement the
narrow Tokenizer interface (encode/decode/convert_ids_to_tokens/
apply_chat_template + eos/vocab properties).

Built-ins:
- ``hf`` (default): transformers AutoTokenizer (engine/tokenizer.py)
- ``hf_slow``: the non-Rust HF tokenizer (``use_fast=False``) — some
  checkpoints ship only slow tokenizers
- ``tiktoken``: registered only when the optional tiktoken package is
  importable (zero-egress images ship without it)
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_tokenizer(mode: str, factory: Callable) -> None:
    """OOT tokenizer backends (ref analog: TokenizerRegistry OOT
    hooks). ``factory(model_path, **kw) -> tokenizer``."""
    _REGISTRY[mode] = factory


def tokenizer_modes() -> list[str]:
    return sorted(_REGISTRY)


def get_tokenizer(model_path: str, mode: str = "auto", **kw):
    """Resolve + build a tokenizer. ``auto`` == ``hf``."""
    if mode == "auto":
        mode = "hf"
    if mode not in _REGISTRY:
        raise ValueError(
            f"unknown tokenizer mode {mode!r}; known: {tokenizer_modes()}")
    return _REGISTRY[mode](model_path, **kw)


def _hf(model_path: str, **kw):
    from vllm_tpu.engine.tokenizer import Tokenizer
    return Tokenizer(model_path, **kw)


def _hf_slow(model_path: str, **kw):
    from vllm_tpu.engine.tokenizer import Tokenizer
    return Tokenizer(model_path, use_fast=False, **kw)


register_tokenizer("hf", _hf)
register_tokenizer("hf_slow", _hf_slow)

try:  # optional backend: not shipped in this image
    import tiktoken as _tiktoken  # noqa: F401

    class TiktokenTokenizer:
        """Minimal tiktoken-backed tokenizer (deepseek_v32-style
        encodings; ref: vllm/tokenizers/deepseek_v32_encoding.py)."""

        def __init__(self, encoding_name: str, **kw) -> None:
            self._enc = _tiktoken.get_encoding(encoding_name)

        @property
        def eos_token_id(self):
            return self._enc.eot_token

        @property
        def vocab_size(self) -> int:
            return self._enc.n_vocab

        def __len__(self) -> int:
            return self._enc.n_vocab

        @property
        def all_special_ids(self) -> list[int]:
            return sorted(self._enc._special_tokens.values())

        def encode(self, text: str, add_special_tokens: bool = True):
            return self._enc.encode(text)

        def decode(self, ids, skip_special_tokens: bool = True) -> str:
            return self._enc.decode(ids)

        def convert_ids_to_tokens(self, ids):
            return [self._enc.decode([i]) for i in ids]

        def apply_chat_template(self, messages, **kw) -> str:
            raise ValueError("tiktoken backend has no chat template")

    register_tokenizer("tiktoken",
                       lambda path, **kw: TiktokenTokenizer(path, **kw))
except ImportError:
    pass
