"""Experiment: decode-attention row-batch / unroll sweep (round 5).

Hypothesis: the ~29 us/call fixed overhead at the bench shape is the
per-grid-program DMA-ring warmup stall (8 sequential programs at
R=32, RB=4); fewer, fatter programs should shrink it.
"""
from __future__ import annotations

import sys

import jax

import vllm_tpu.ops.pallas.decode_attention as da
from benchmarks import micro_decode_attn as m


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fp8_pth"
    for rb_cands in ((4, 2, 1), (8, 4, 2, 1), (16, 8, 4, 2, 1)):
        da.MAX_UNROLL = rb_cands[0] * 8
        da._pick_row_batch.__defaults__ = ()

        def pick(R, HG, cands=rb_cands):
            for rb in cands:
                if R % rb == 0 and rb * HG <= da.MAX_UNROLL:
                    return rb
            return 1

        da._pick_row_batch = pick
        jax.clear_caches()
        for seq in (160, 512):
            us = m.run(mode, seq)
            print(f"RB<={rb_cands[0]:2d} {mode} seq={seq}: {us:8.1f} us",
                  flush=True)


if __name__ == "__main__":
    main()
