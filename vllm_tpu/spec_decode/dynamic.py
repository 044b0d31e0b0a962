"""Dynamic speculative decoding: scale the draft length K with the
runtime batch size.

Ref analog: vllm/v1/spec_decode/dynamic/utils.py
(validate_and_normalize_dynamic_sd_schedule +
build_dynamic_sd_schedule_lookup). Speculation trades target-model
FLOPs for latency; at large batch sizes the target step is already
compute-saturated and drafting wastes MXU time, so the schedule maps
batch-size ranges to (possibly zero) K:

    [(range_start, range_end, num_speculative_tokens), ...]

inclusive, sorted, non-overlapping, first range starting at 1. The
dense lookup makes the per-step decision an array index.
"""

from __future__ import annotations

Schedule = list[tuple[int, int, int]]


def normalize_schedule(raw: object) -> Schedule:
    """Validate a batch-size schedule (same rules as the reference's
    validate_and_normalize_dynamic_sd_schedule)."""
    if not isinstance(raw, list) or not raw:
        raise ValueError(
            "num_speculative_tokens_per_batch_size must be a non-empty "
            "list of (range_start, range_end, num_speculative_tokens)")
    parsed: Schedule = []
    for entry in raw:
        if not isinstance(entry, (list, tuple)) or len(entry) != 3:
            raise ValueError(
                f"schedule entry {entry!r} must be a 3-item "
                f"(range_start, range_end, k) sequence")
        lo, hi, k = int(entry[0]), int(entry[1]), int(entry[2])
        if lo <= 0 or hi <= 0:
            raise ValueError(f"batch-size range ({lo}, {hi}) must be "
                             f"positive")
        if lo > hi:
            raise ValueError(f"range start {lo} > end {hi}")
        if k < 0:
            raise ValueError(f"num_speculative_tokens {k} must be >= 0")
        parsed.append((lo, hi, k))
    parsed.sort(key=lambda e: e[0])
    prev_end = 0
    for lo, hi, _ in parsed:
        if lo <= prev_end:
            raise ValueError("batch-size ranges must be non-overlapping")
        prev_end = hi
    if parsed[0][0] != 1:
        raise ValueError("the first batch-size range must start at 1")
    return parsed


def build_lookup(raw: object, max_batch_size: int,
                 default_k: int) -> list[int]:
    """Dense 1-indexed batch_size -> K table (index 0 unused). Batch
    sizes past the last configured range fall back to that range's K;
    gaps between ranges fall back to ``default_k`` — matching the
    reference's build_dynamic_sd_schedule_lookup fill rules."""
    schedule = normalize_schedule(raw)
    lookup = [default_k] * (max_batch_size + 1)
    lookup[0] = 0
    for lo, hi, k in schedule:
        for bs in range(lo, min(hi, max_batch_size) + 1):
            lookup[bs] = k
    # Tail: batch sizes beyond the last range keep its K.
    last_hi, last_k = schedule[-1][1], schedule[-1][2]
    for bs in range(min(last_hi, max_batch_size) + 1,
                    max_batch_size + 1):
        lookup[bs] = last_k
    return lookup
