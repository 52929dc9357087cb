"""Round-4 flash-kernel profile: boundary-split + int8-QK variants on chip.

Shapes:
- LM prefill: q [1, 15360, 28, 128], kv 4 heads, causal (the 10-min AF3 TTFT shape;
  round-3 baseline 16.7 ms/layer = 101.6 TF/s, docs/TTFT_PERF.md).
- Encoder: q/k/v [20, 1500, 20, 64], non-causal (round-3 baseline 6.03 ms @ bq=512
  bk=2048, docs/ENCODER_PERF.md).

Device-chained fori timing (host loops lie through the tunnel, CLAUDE.md).
Run: python scripts/profile_flash_r4.py   (one TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention
from audio_flamingo_tpu.ops.pallas.flash_attention_a8 import flash_attention_a8

N = 8


def timed(fn, q, n=N):
    @jax.jit
    def run(q):
        def body(i, carry):
            q, acc = carry
            y = fn(q)
            y0 = jax.lax.convert_element_type(y.ravel()[0], jnp.float32)
            tap = jax.lax.convert_element_type(y0 * 1e-38, q.dtype)
            return q + tap, acc + y0
        _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
        return acc

    _ = float(run(q))
    t0 = time.perf_counter()
    jax.block_until_ready(run(q))
    return (time.perf_counter() - t0 - 0.04) / n


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # --- LM prefill shape
    T = 15360
    q = jnp.asarray(rng.normal(size=(1, T, 28, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, T, 4, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, T, 4, 128)), jnp.bfloat16)
    flops = 2 * T * T * 28 * 128  # causal-adjusted (x2 dots / 2 causal)

    dt = timed(lambda q: flash_attention(q, k, v, causal=True), q)
    print(f"LM bf16 split  : {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s "
          f"(r3 baseline 16.7 ms)")
    dt8 = timed(lambda q: flash_attention_a8(q, k, v, causal=True), q)
    print(f"LM a8 (i8 QK)  : {dt8*1e3:7.2f} ms  {flops/dt8/1e12:6.1f} TF/s-eq")

    # --- encoder shape
    qe = jnp.asarray(rng.normal(size=(20, 1500, 20, 64)), jnp.bfloat16)
    ke = jnp.asarray(rng.normal(size=(20, 1500, 20, 64)), jnp.bfloat16)
    ve = jnp.asarray(rng.normal(size=(20, 1500, 20, 64)), jnp.bfloat16)
    eflops = 2 * 2 * 20 * 20 * 1500 * 1500 * 64

    dte = timed(lambda q: flash_attention(q, ke, ve, scale=1.0, block_q=512,
                                          block_k=2048), qe)
    print(f"ENC bf16 split : {dte*1e3:7.2f} ms  {eflops/dte/1e12:6.1f} TF/s "
          f"(r3 baseline 6.03 ms)")
    dte8 = timed(lambda q: flash_attention_a8(q, ke, ve, scale=1.0, block_q=512,
                                              block_k=2048), qe)
    print(f"ENC a8 (i8 QK) : {dte8*1e3:7.2f} ms  {eflops/dte8/1e12:6.1f} TF/s-eq")


if __name__ == "__main__":
    main()
