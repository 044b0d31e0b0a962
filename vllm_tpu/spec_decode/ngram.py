"""N-gram draft proposer (prompt-lookup decoding).

Ref analog: vllm/v1/spec_decode/ngram_proposer.py (NgramProposer:12):
find the longest trailing n-gram (between lookup_min and lookup_max)
that occurred earlier in the token history; propose the tokens that
followed that occurrence. Pure host logic — zero device cost, and the
classic big win on repetitive text (ref headline: 104.77 req/s with
ngram spec, docs/benchmarking/cli.md:778).
"""

from __future__ import annotations

import numpy as np

from vllm_tpu.config import SpeculativeConfig


class NgramProposer:

    def __init__(self, config: SpeculativeConfig) -> None:
        self.k = config.num_speculative_tokens
        self.min_n = config.prompt_lookup_min
        self.max_n = config.prompt_lookup_max

    def propose(self, token_ids: list[int]) -> list[int]:
        """Draft up to k tokens following the latest earlier occurrence
        of the longest matching trailing n-gram (vectorized scan)."""
        L = len(token_ids)
        if L < self.min_n + 1:
            return []
        arr = np.asarray(token_ids, dtype=np.int64)
        for n in range(min(self.max_n, L - 1), self.min_n - 1, -1):
            suffix = arr[L - n:]
            # Candidate starts 0 .. L-1-n: each leaves >=1 follow token.
            windows = np.lib.stride_tricks.sliding_window_view(
                arr[:L - 1], n)
            matches = np.nonzero((windows == suffix).all(axis=1))[0]
            if len(matches):
                start = int(matches[-1])
                return token_ids[start + n:start + n + self.k]
        return []
