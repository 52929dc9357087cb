"""Measure this chip's actual HBM streaming bandwidth + honest int8/w4 matmul rates.

The decode roofline hinges on HBM GB/s; axon's 'TPU v5 lite' label suggests v5e
(819 GB/s) but measured matmuls exceeded that, so measure directly:
  1. pure stream: y = x + 1 over a 1 GB bf16 buffer (read+write = 2x bytes)
  2. int8 dot with TWO alternating weight buffers (defeats any cross-call reuse)
  3. same for the w4 Pallas kernel
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, args_list, n=30):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)

    # 1. pure HBM stream
    nbytes = 1 << 30
    x = jnp.zeros(nbytes // 2, jnp.bfloat16)

    @jax.jit
    def stream(x):
        return x + jnp.bfloat16(1.0)

    dt = timeit(stream, [(x,)], n=20)
    print(f"stream 1GB read+write: {dt*1e3:.2f} ms -> {2*nbytes/dt/1e9:.0f} GB/s",
          flush=True)
    del x

    # 2. int8 dot, alternating weights
    rng = np.random.default_rng(0)
    m, k, n = 8, 18944, 3584
    xx = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    w_a = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    w_b = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    s = jnp.full((n,), 1e-3, jnp.float32)

    @jax.jit
    def d_int8(x, w8, s):
        y = jax.lax.dot_general(x, w8.astype(x.dtype), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * s).astype(x.dtype)

    for label, bufs in (("same-buf ", [(xx, w_a, s)]),
                        ("alt-bufs ", [(xx, w_a, s), (xx, w_b, s)])):
        dt = timeit(d_int8, bufs, n=40)
        print(f"int8 [{m},{k}]x[{k},{n}] {label}: {dt*1e6:7.1f} us  "
              f"{k*n/dt/1e9:6.1f} GB/s", flush=True)

    # 3. w4 kernel, alternating weights
    from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul

    G = 128
    wp_a = jnp.asarray(rng.integers(-128, 128, size=(k // 2, n)), jnp.int8)
    wp_b = jnp.asarray(rng.integers(-128, 128, size=(k // 2, n)), jnp.int8)
    gs = jnp.full((k // G, n), 1e-3, jnp.float32)
    for label, bufs in (("same-buf ", [(xx, wp_a, gs)]),
                        ("alt-bufs ", [(xx, wp_a, gs), (xx, wp_b, gs)])):
        dt = timeit(w4a16_matmul, bufs, n=40)
        print(f"w4   [{m},{k}]x[{k},{n}] {label}: {dt*1e6:7.1f} us  "
              f"{k*n/2/dt/1e9:6.1f} GB/s(i4)", flush=True)


if __name__ == "__main__":
    main()
