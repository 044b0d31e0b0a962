"""User-facing sampling parameters.

Ref analog: vllm/sampling_params.py. Kept minimal-but-real: the fields
here all reach the device sampler (temperature/top-k/top-p/seed/
penalties) or the output processor (stop conditions, logprobs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


@dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 == disabled
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: Optional[int] = None
    max_tokens: int = 16
    min_tokens: int = 0
    stop: Union[str, list[str], None] = None
    stop_token_ids: list[int] = field(default_factory=list)
    ignore_eos: bool = False
    logprobs: Optional[int] = None
    # Additive per-token logit bias {token_id: bias} (OpenAI
    # logit_bias; ref: vllm logit_bias logits processor). Applied on
    # device before temperature/top-k/top-p.
    logit_bias: Optional[dict[int, float]] = None
    # Top-k logprobs per PROMPT position (ref: vllm prompt_logprobs):
    # computed during prefill, returned once on the first output.
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    include_stop_str_in_output: bool = False
    # Structured output (ref: vllm guided decoding params). Exactly one
    # of these may be set:
    # - guided_choice: one of N strings (token-trie backend)
    # - guided_regex: output matches the pattern (regex->DFA backend)
    # - guided_json: output is JSON valid under the schema
    #   (schema->regex->DFA for flat schemas, schema->EBNF->pushdown
    #   for recursive/open ones, see structured_output/cfg.py)
    # - guided_grammar: output matches a GBNF-style EBNF grammar
    #   (pushdown backend; ref: xgrammar EBNF grammars,
    #   backend_xgrammar.py:1-363)
    guided_choice: Optional[list[str]] = None
    guided_regex: Optional[str] = None
    guided_json: Union[dict, str, None] = None
    guided_grammar: Optional[str] = None

    def __post_init__(self) -> None:
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        elif self.stop is None:
            self.stop = []
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0 (0 disables)")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        n_guided = sum(x is not None and x != []
                       for x in (self.guided_choice, self.guided_regex,
                                 self.guided_json, self.guided_grammar))
        if n_guided > 1:
            raise ValueError("at most one of guided_choice/guided_regex/"
                             "guided_json/guided_grammar may be set")

    @property
    def has_penalties(self) -> bool:
        """Anything that needs the [R, V] device stats/bias arrays."""
        return (self.repetition_penalty != 1.0
                or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0
                or bool(self.logit_bias))

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

    @property
    def guided(self) -> bool:
        """Any structured-output constraint set."""
        return bool(self.guided_choice) or bool(self.guided_regex) or \
            self.guided_json is not None or bool(self.guided_grammar)


@dataclass
class PoolingParams:
    """Pooling request parameters (ref analog: vllm/pooling_params.py).

    pooling_type: how prompt hidden states collapse to one vector —
    "last" (final prompt token; decoder-style embedders), "mean"
    (exact over the full prompt, chunked-prefill-safe via streamed
    accumulation), or "cls" (first token).
    """

    pooling_type: str = "last"  # last | mean | cls
    normalize: bool = True
    # Matryoshka-style truncation: keep the first N dims (None = all).
    dimensions: Optional[int] = None
