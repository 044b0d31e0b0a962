"""Small shared utilities (math, padding ladders, logging).

Ref analog: vllm/utils/ (round_up/cdiv helpers used by kernels) and the
cudagraph padding ladder (ref: vllm/v1/cudagraph_dispatcher.py
``_compute_bs_to_padded_graph_size():72``) — on TPU the ladder picks the
jit shape bucket instead of a captured CUDA graph.
"""

from __future__ import annotations

import logging
import os

_LOG_FORMAT = "%(levelname)s %(asctime)s [%(name)s] %(message)s"


def init_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger("vllm_tpu").handlers:
        root = logging.getLogger("vllm_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_LOG_FORMAT, "%H:%M:%S"))
        root.addHandler(handler)
        from vllm_tpu import envs
        root.setLevel(envs.VLLM_TPU_LOG_LEVEL.upper())
        root.propagate = False
    return logger


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def padded_bucket(n: int, min_size: int = 16, max_size: int | None = None,
                  ladder: tuple[int, ...] | None = None) -> int:
    """Pick the jit shape bucket for a dynamic count ``n``.

    Buckets are powers of two with a floor (few distinct compiled
    programs, bounded padding waste <2x). ``ladder`` overrides with an
    explicit sorted tuple of sizes.
    """
    if ladder is not None:
        for b in ladder:
            if n <= b:
                return b
        return ladder[-1]
    b = max(min_size, next_power_of_2(n))
    if max_size is not None:
        b = min(b, max_size)
    return b


class Counter:
    """Monotonic id generator (request ids etc.)."""

    def __init__(self, start: int = 0) -> None:
        self._n = start

    def __next__(self) -> int:
        n = self._n
        self._n += 1
        return n
