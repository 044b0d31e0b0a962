"""Probe: does the axon relay execute dispatched computations eagerly
(device runs while host sleeps) or lazily (execution forced by the
next blocking fetch)?

Method: dispatch a ~0.5 s device computation, host-sleep 1 s, then
time block_until_ready. Eager relay -> fetch returns ~instantly;
lazy relay -> fetch pays the full device time.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print(f"devices: {jax.devices()}")
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (4096, 4096)), jnp.bfloat16)


import functools
@functools.partial(jax.jit, static_argnums=(1,))
def burn(x, n):
    def body(c, _):
        c = jnp.tanh(c @ x) * 0.5 + c * 0.5
        return c, ()

    c, _ = jax.lax.scan(body, x, None, length=n)
    return c


# warm compile
jax.block_until_ready(burn(x, 10))
t0 = time.perf_counter()
jax.block_until_ready(burn(x, 400))
t_dev = time.perf_counter() - t0
print(f"device time for n=400: {t_dev*1e3:.0f} ms")

for sleep_s in (0.0, max(1.0, 2 * t_dev)):
    t0 = time.perf_counter()
    y = burn(x, 400)
    t_disp = time.perf_counter() - t0
    time.sleep(sleep_s)
    t1 = time.perf_counter()
    jax.block_until_ready(y)
    t_fetch = time.perf_counter() - t1
    print(f"sleep {sleep_s:4.1f}s: dispatch {t_disp*1e3:6.1f} ms, "
          f"fetch-after-sleep {t_fetch*1e3:6.1f} ms")

# upload cost probe: how long does a small jnp.asarray H2D block?
h = np.zeros((32, 36), np.int32)
for _ in range(3):
    t0 = time.perf_counter()
    d = jnp.asarray(h)
    t_up = time.perf_counter() - t0
    jax.block_until_ready(d)
    t_rdy = time.perf_counter() - t0
    print(f"small upload: asarray {t_up*1e3:6.1f} ms, ready "
          f"{t_rdy*1e3:6.1f} ms")

# D2H probe
y = jax.block_until_ready(burn(x, 10))
for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(y[0, :8])
    print(f"tiny D2H: {(time.perf_counter()-t0)*1e3:6.1f} ms")
