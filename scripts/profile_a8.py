"""Microbenchmark the w8a8 prefill matmul path on the attached TPU.

Timing methodology (CLAUDE.md rule 6): the tunnel's async dispatch makes
per-call host timing meaningless, so each measurement runs N data-dependent
iterations inside ONE jitted lax.fori_loop (the output perturbs the next
input by +0, forcing serialization) and divides by N after block_until_ready.

Questions:
  1. Does XLA's dot_general(int8, int8, preferred=int32) hit the MXU's native
     int8 rate (~394 TOPS on v5e, 2x bf16)?
  2. What does per-token dynamic activation quantization cost at prefill shapes?
  3. Where does the remaining a8-prefill time go?

Run:  python scripts/profile_a8.py   (one TPU process at a time!)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.ops.quant import q_matmul_a8, q_matmul

N = 20


def timed_loop(step, x0, n=N):
    """step: x -> y (y possibly different shape). Chains via a zero scalar tap."""

    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            y = step(x)
            tap = jax.lax.convert_element_type(y.ravel()[0] * 0, x.dtype)
            return x + tap, acc + jax.lax.convert_element_type(
                y.ravel()[0], jnp.float32)
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    _ = float(run(x0))  # compile + warm
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return (dt - 0.04) / n  # subtract one ~40 ms tunnel sync


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    T = 15360
    shapes = [
        ("qkv d->d ", 3584, 3584),
        ("mlp d->f ", 3584, 18944),
        ("mlp f->d ", 18944, 3584),
    ]
    for name, din, dout in shapes:
        x_bf = jnp.asarray(rng.normal(size=(T, din)), jnp.bfloat16)
        w_bf = jnp.asarray(rng.normal(size=(din, dout)) * 0.02, jnp.bfloat16)
        x_i8 = jnp.asarray(rng.integers(-127, 128, size=(T, din)), jnp.int8)
        w_i8 = jnp.asarray(rng.integers(-127, 128, size=(din, dout)), jnp.int8)
        p = {"w_q": w_i8, "scale": jnp.full((dout,), 1e-4, jnp.float32)}
        flops = 2.0 * T * din * dout

        dt = timed_loop(lambda a: jnp.dot(a, w_bf,
                                          preferred_element_type=jnp.float32)
                        .astype(jnp.bfloat16), x_bf)
        print(f"{name}: bf16xbf16->f32   {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s")

        dt = timed_loop(lambda a: jax.lax.dot_general(
            a, w_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8), x_i8)
        print(f"{name}: int8xint8->int32 {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TOP/s")

        dt = timed_loop(lambda a: q_matmul_a8(a, p), x_bf)
        print(f"{name}: q_matmul_a8      {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TOP/s")

        dt = timed_loop(lambda a: q_matmul(a, p), x_bf)
        print(f"{name}: q_matmul (w8a16) {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s")
        print(flush=True)


if __name__ == "__main__":
    main()
