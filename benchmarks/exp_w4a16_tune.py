"""Experiment: W4A16 gsup / bn retune at decode T=32 (round 5).

The kernel runs at 94.4% of the practical DMA ceiling (756 GB/s);
sweep grid-step fatness to see if the last 5% is reachable.
"""
from __future__ import annotations

import jax

import vllm_tpu.quant.pallas_w4a16 as w
from benchmarks import micro_w4a16 as m


def main():
    print(f"devices: {jax.devices()}")
    base_gsup = w.pick_gsup
    base_bn = w.pick_bn
    for label, gs, bncap in (
        ("gsup4 base", (4, 2, 1), None),
        ("gsup8     ", (8, 4, 2, 1), None),
        ("gsup2     ", (2, 1), None),
        ("gsup8 bn2k", (8, 4, 2, 1), 2048),
    ):
        def pick_gsup(G, bn, bt, cands=gs):
            for g in cands:
                if G % g == 0 and g * (64 * bn + bt * 128 * 2) <= (4 << 20):
                    return g
            return 1

        def pick_bn(N, bt, cap=bncap):
            if cap is None:
                return base_bn(N, bt)
            for cand in (2048, 1024, 512, 256, 128):
                if cand <= cap and N % cand == 0:
                    return cand
            return N

        w.pick_gsup = pick_gsup
        w.pick_bn = pick_bn
        jax.clear_caches()
        tot = flo = 0.0
        for name, (K, N) in m.SHAPES.items():
            us, f = m.run(name, K, N, 32)
            if name != "lm_head":
                tot += us
                flo += f
        print(f"{label}: per-layer {tot:7.1f} us ({100*flo/tot:5.1f}% "
              f"of 819-floor)", flush=True)
    w.pick_gsup = base_gsup
    w.pick_bn = base_bn


if __name__ == "__main__":
    main()
