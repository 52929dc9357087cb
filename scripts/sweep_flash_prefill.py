"""Sweep flash-attention block sizes at the EXACT 10-min AF3 prefill shape:
q [1, 15360, 28, 128], kv [1, 15360, 4, 128], causal (GQA 7:1).

The TTFT profile (scripts/profile_ttft.py) shows attention+rope at ~517 ms of
the 1.09 s a8 prefill (~94 TF/s, 48% MXU) — this sweep asks whether a better
(block_q, block_k) point exists for this specific geometry.

Run: python scripts/sweep_flash_prefill.py  (one TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.ops.pallas import flash_attention as fa_mod
from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

N = 8


def timed(bq, bk, q, k, v, n=N):
    @jax.jit
    def run(q):
        def body(i, carry):
            q, acc = carry
            y = flash_attention(q, k, v, causal=True, block_q=bq, block_k=bk)
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
    T = 15360
    q = jnp.asarray(rng.normal(size=(1, T, 28, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, T, 4, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, T, 4, 128)), jnp.bfloat16)
    flops = 2 * T * T * 28 * 128  # causal-adjusted
    best = (None, 1e9)
    for super_ in (4096, 8192, 15360):
        fa_mod._BLOCK_SUPER = super_
        for bq in (256, 512, 1024):
            for bk in (512, 1024, 2048):
                if bk > super_ or bq > T:
                    continue
                try:
                    dt = timed(bq, bk, q, k, v)
                except Exception as e:  # noqa: BLE001
                    print(f"super={super_:5d} bq={bq:4d} bk={bk:4d}  FAILED "
                          f"{type(e).__name__}", flush=True)
                    continue
                print(f"super={super_:5d} bq={bq:4d} bk={bk:4d}  {dt*1e3:7.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
                if dt < best[1]:
                    best = ((super_, bq, bk), dt)
    print(f"BEST: super/bq/bk={best[0]}  {best[1]*1e3:.2f} ms  "
          f"{flops/best[1]/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
