import time
import numpy as np

def _time(fn, *args, iters=50):
    import jax
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

def main():
    import jax, jax.numpy as jnp, functools
    from vllm_tpu.quant.kernels import prepare_weights, quantized_matmul
    rng = np.random.default_rng(0)
    E, I, H, KH, D = 4096, 14336, 32, 8, 128
    R = 32
    def qleaf(K, N):
        s = (rng.random((K // 128, N), dtype=np.float32) + 0.5) * 0.004
        return {"qweight": jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8)),
                "scales": jnp.asarray(s), "zbias": jnp.asarray(-8.0 * s)}
    shapes = {"qkv": (E, (H + 2 * KH) * D), "o": (H * D, E),
              "gate_up": (E, 2 * I), "down": (I, E)}
    leaves = {k: prepare_weights([qleaf(*v)])[0] for k, v in shapes.items()}
    for name, (K, N) in shapes.items():
        leaf = leaves[name]
        x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
        @jax.jit
        def rep(x, leaf=leaf):
            # 32 sequential calls like the layer loop (dependency chain
            # via a cheap transform to prevent CSE)
            for _ in range(32):
                y = quantized_matmul(x, leaf)
                x = y[:, :x.shape[1]] if y.shape[1] >= x.shape[1] else jnp.pad(y, ((0,0),(0,x.shape[1]-y.shape[1])))
            return x
        ms = _time(rep, x, iters=20)
        bytes_w = K * N // 2 + K // 128 * N * 8
        bw = 32 * bytes_w / (ms / 1e3) / 1e9
        print(f"{name:8s} K={K:6d} N={N:6d}: {ms:6.2f} ms/32calls "
              f"({ms/32*1000:6.1f} us/call, {bw:5.0f} GB/s)")

main()
