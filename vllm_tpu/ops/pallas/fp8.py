"""In-kernel fp8 (e4m3fn) decode via integer bit manipulation.

Mosaic's bulk e4m3->f32/bf16 vector conversion lowers extremely slowly
on v5e at KV-tile shapes (measured ~7 ms/step of pure convert time in
the decode kernel at 8B bs32 — 6x the whole kernel). Reconstructing
the f32 bit pattern with integer ops + one i32->f32 bitcast runs at
full VPU rate: value = (-1)^s * (1 + man/8) * 2^(exp-7), f32 exponent
field = exp + 120, mantissa = man << 20; subnormals (exp == 0) are
man * 2^-9.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def e4m3_to_f32(x: jax.Array) -> jax.Array:
    """x: float8_e4m3fn (or uint8 bit pattern) -> f32, elementwise."""
    if x.dtype != jnp.uint8:
        x = pltpu.bitcast(x, jnp.uint8)
    b = x.astype(jnp.int32)
    sign = (b >> 7) & 1
    exp = (b >> 3) & 0xF
    man = b & 7
    bits = ((exp + 120) << 23) | (man << 20)
    val = pltpu.bitcast(bits, jnp.float32)
    val = jnp.where(exp == 0, man.astype(jnp.float32) * (1.0 / 512.0),
                    val)
    return jnp.where(sign == 1, -val, val)
