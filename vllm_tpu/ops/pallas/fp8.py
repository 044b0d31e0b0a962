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
    """x: float8_e4m3fn (or uint8 bit pattern) -> f32, elementwise.
    Exact for all codes including subnormals (used off the hot path)."""
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


def e4m3ftz_to_f32(x: jax.Array) -> jax.Array:
    """Flush-to-zero e4m3 decode — the KV hot-path variant (~9 VPU ops
    vs ~17 for the exact decode; measured the difference as most of
    fp8-KV's gap over bf16 attention, VERDICT r2 item 4).

    Normals decode exactly: the f32 magnitude bit pattern is one
    shifted-add, ((b & 0x7F) << 20) + (120 << 23), and the sign bit
    moves straight up, (b & 0x80) << 24. Subnormal codes (|b| & 0x7F
    < 8, values below 2^-6 of the per-token-head scale) decode to 0 —
    the KV quantizers flush them at encode time (quantize_rows), so
    cache contents round-trip bit-identically; raw-byte inputs lose
    only magnitudes < scale/57000, invisible next to the e4m3
    quantization noise itself."""
    if x.dtype != jnp.uint8:
        x = pltpu.bitcast(x, jnp.uint8)
    b = x.astype(jnp.int32)
    m = b & 0x7F
    bits = ((m << 20) + (120 << 23)) | ((b & 0x80) << 24)
    val = pltpu.bitcast(bits, jnp.float32)
    return jnp.where(m < 8, 0.0, val)


#: exponent rebias for the magnitude-placement decode (f32 bias 127 at
#: bit 20 vs e4m3 bias 7 => raw pattern = value * 2**-120).
E4M3_MAG_FIX = 2.0 ** 120


def e4m3_mag_f32(x: jax.Array) -> jax.Array:
    """e4m3fn -> f32 by magnitude placement (~8 VPU ops vs ~10 for
    e4m3ftz_to_f32; the decode chain is pure-VPU-bound so op count is
    time).

    Placing the 7 magnitude bits at f32 bit 20 makes the f32 exponent
    field equal the e4m3 exponent and the 3 mantissa bits land
    exactly; one multiply by ``E4M3_MAG_FIX`` rebiases the exponent —
    no bias add, no subnormal select. The rebias multiply must stay
    fused here, NOT deferred past a dot: a raw (* 2**-120) operand
    makes individual MXU products denormal, and the FTZ hardware
    flushes each one — measured as real error at attention shapes
    (small attention contributions vanish). e4m3 subnormal codes
    decode to f32 denormals: FTZ units flush them exactly like
    e4m3ftz_to_f32's explicit flush (the KV quantizers already flush
    at encode time); non-FTZ backends (CPU interpret) decode them
    exactly."""
    if x.dtype != jnp.uint8:
        x = pltpu.bitcast(x, jnp.uint8)
    b = x.astype(jnp.int32)
    bits = ((b & 0x7F) << 20) | ((b & 0x80) << 24)
    return pltpu.bitcast(bits, jnp.float32) * E4M3_MAG_FIX


def e4m3_quad_bf16(x: jax.Array, interpret: bool = False) -> jax.Array:
    """[rows, D] e4m3 bytes -> [rows, D] bf16 valued ``value *
    2**-120``, rows emitted in [evens; odds] storage order — the
    hot-path bulk decode (~3.5x fewer VPU ops than e4m3_mag_f32).

    The W4A16 kernel's no-widen trick applied to fp8: VMEM stores u8
    rows (4, 1)-packed, so a bitcast views 4 consecutive byte rows as
    one i32 row with zero data movement. e4m3 is a float format whose
    magnitude fits bf16 exactly (4-bit exponent at bf16 bits 10-7,
    3-bit mantissa at 6-4), so two bytes of each i32 lane place
    straight into the two bf16 slots:

        oe = ((t << 4) & 0x07F007F0) | ((t << 8) & 0x80008000)
        oo = ((t >> 4) & 0x07F007F0) | ( t       & 0x80008000)

    9 i32 ops per 4 bytes, no widen, no f32->bf16 convert. bf16 slot
    pairs unpack little-endian (lo slot = byte 0), so ``oe`` rows are
    even storage rows in order and ``oo`` odd — callers index columns
    through the parity map and read fp8_pth scales from the
    parity-split lane layout (kv_cache.parity_scale_lane).

    The 2**120 exponent rebias is NOT applied: fold ``E4M3_MAG_FIX``
    into the OTHER operand of each dot (q for scores, p or the V scale
    row for the output dot) — folding it after a dot lets individual
    MXU products denormalize and FTZ flushes them (real error).
    e4m3 subnormal codes decode to bf16 denormals: FTZ units flush
    them (the quantizers never store them); interpret mode matches the
    TPU bit pattern exactly."""
    if interpret:  # shape-changing bitcast semantics differ off-TPU
        f = e4m3_mag_f32(x) * (1.0 / E4M3_MAG_FIX)
        return jnp.concatenate([f[0::2], f[1::2]],
                               axis=0).astype(jnp.bfloat16)
    if x.dtype != jnp.uint8:
        x = pltpu.bitcast(x, jnp.uint8)
    t = pltpu.bitcast(x, jnp.int32)  # [rows/4, D]
    m = jnp.int32(0x07F007F0)
    sgn = jnp.int32(-2147450880)  # 0x80008000 as i32
    oe = ((t << 4) & m) | ((t << 8) & sgn)
    oo = ((t >> 4) & m) | (t & sgn)
    return pltpu.bitcast(jnp.concatenate([oe, oo], axis=0),
                         jnp.bfloat16)


def parity_token_map(within, half: int):
    """Inverse of the [evens; odds] emission: decoded row index within
    a tile span -> storage/token offset. ``half`` = span // 2."""
    return jnp.where(within < half, 2 * within,
                     2 * (within - half) + 1)


def int8_to_f32(x: jax.Array) -> jax.Array:
    """int8 -> f32 via the exponent-bias trick (bitcast add/sub only;
    Mosaic's s8->s32->f32 convert chain measured ~2.2 ms/step of pure
    convert time in the decode kernel at 8B bs32 — slower than the
    fp8 *bit decode*). XOR 0x80 rebiased the two's-complement byte to
    offset-128; OR into the 2^23 exponent makes f32(2^23 + (q+128));
    one subtract recovers q exactly (integers < 2^24 are exact)."""
    if x.dtype != jnp.uint8:
        x = pltpu.bitcast(x, jnp.uint8)
    b = x.astype(jnp.int32)
    bits = (b ^ 0x80) | 0x4B000000
    return pltpu.bitcast(bits, jnp.float32) - (8388608.0 + 128.0)
