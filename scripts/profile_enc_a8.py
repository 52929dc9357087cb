"""Why is the a8 encoder only ~10% faster than bf16? Probe the raw int8 matmul
rate at encoder shapes (K=1280 reduction vs the LM's K=3584/18944).

Run: python scripts/profile_enc_a8.py  (one TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.ops.quant import q_matmul_a8, quantize_act

N = 20


def timed_loop(step, x0, n=N):
    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            y = step(x)
            y0 = jax.lax.convert_element_type(y.ravel()[0], jnp.float32)
            tap = jax.lax.convert_element_type(y0 * 1e-38, x.dtype)
            return x + tap, acc + y0
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    _ = float(run(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    return (time.perf_counter() - t0 - 0.04) / n


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    M = 30720
    for din, dout in [(1280, 1280), (1280, 5120), (5120, 1280), (3584, 3584)]:
        x_bf = jnp.asarray(rng.normal(size=(M, din)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.normal(size=(din, dout)) * 0.02, jnp.bfloat16)
        x_i8 = jnp.asarray(rng.integers(-127, 128, size=(M, din)), jnp.int8)
        w_i8 = jnp.asarray(rng.integers(-127, 128, size=(din, dout)), jnp.int8)
        p = {"w_q": w_i8, "scale": jnp.full((dout,), 1e-4, jnp.float32)}
        flops = 2.0 * M * din * dout

        dt = timed_loop(lambda a: jnp.dot(a, w_bf,
                                          preferred_element_type=jnp.float32)
                        .astype(jnp.bfloat16), x_bf)
        print(f"[{M},{din}]x[{din},{dout}] bf16      {dt*1e3:7.2f} ms "
              f"{flops/dt/1e12:6.1f} TF/s")
        dt = timed_loop(lambda a: jax.lax.dot_general(
            a, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8), x_i8)
        print(f"[{M},{din}]x[{din},{dout}] int8 raw  {dt*1e3:7.2f} ms "
              f"{flops/dt/1e12:6.1f} TOP/s")
        dt = timed_loop(lambda a: q_matmul_a8(a, p), x_bf)
        print(f"[{M},{din}]x[{din},{dout}] q_mm_a8   {dt*1e3:7.2f} ms "
              f"{flops/dt/1e12:6.1f} TOP/s")
        print(flush=True)

    # quantize_act sweep cost at encoder shapes
    for din in (1280, 5120):
        x_bf = jnp.asarray(rng.normal(size=(M, din)), jnp.bfloat16)
        dt = timed_loop(lambda a: quantize_act(a)[0], x_bf)
        print(f"quantize_act [{M},{din}]          {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
