"""Measure the *practical* HBM read bandwidth ceiling on this chip.

A Pallas kernel that only DMAs HBM tiles into a VMEM ring (double
buffered) and reduces one lane to defeat DCE — no compute, no
write-back. The result calibrates the roofline table in
docs/roofline.md: kernel GB/s should be judged against THIS number,
not the paper spec (819 GB/s v5e), which includes no refresh/ECC/
controller losses.

Device-trace timed (wall timing through the axon tunnel carries a
~28 ms fixed round trip).
"""
from __future__ import annotations

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.micro_decode_attn import device_kernel_us

RING = 4


def _kernel(hbm_ref, o_ref, buf, sems, *, nblk: int):
    def start(i, slot):
        pltpu.make_async_copy(hbm_ref.at[i], buf.at[slot],
                              sems.at[slot]).start()

    for s in range(RING):
        start(s, s)

    def body(i, acc):
        slot = i % RING
        pltpu.make_async_copy(hbm_ref.at[i], buf.at[slot],
                              sems.at[slot]).wait()
        acc = acc + buf[slot, 0, :1]

        @pl.when(i + RING < nblk)
        def _():
            start(i + RING, slot)

        return acc

    acc = jax.lax.fori_loop(0, nblk, body, jnp.zeros((1, 128),
                                                     jnp.float32))
    o_ref[...] = acc


def main() -> None:
    print(f"devices: {jax.devices()}")
    for mb in (64, 256, 1024):
        nblk = mb * 1024 * 1024 // (512 * 128 * 4)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((nblk, 512, 128)),
            jnp.float32)

        fn = pl.pallas_call(
            lambda h, o, b, s: _kernel(h, o, b, s, nblk=nblk),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((RING, 512, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((RING,)),
            ],
        )
        f = jax.jit(lambda x: fn(x)[0, :4])
        _ = np.asarray(f(x))
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _i in range(10):
                    _ = np.asarray(f(x))
            us = device_kernel_us(td, "_lambda_")
        gb = mb * 1024 * 1024 / 1e9  # decimal GB, matching kernel tables
        print(f"{mb:5d} MB: {us:9.1f} us  -> {gb / (us / 1e6):6.1f} GB/s read")


if __name__ == "__main__":
    main()
