"""Round 2 of w4 decode-matmul probes — DEVICE-CHAINED timing.

profile_hbm.py proved host-side loops mistime through the axon tunnel
(block_until_ready returns early; 'stream' showed 58 TB/s), so every
measurement here chains N matmuls in ONE jitted fori_loop with a data
dependency, and reports (t(N2) - t(N1)) / (N2 - N1) to cancel the ~40 ms
tunnel sync (CLAUDE.md rule 6).

Variants:
  C. current kernel (int32 unpack, per-group dots, bn 512)
  F. int8-native unpack kernel, bn/max_groups sweep
  D. XLA int8 dot (today's decode baseline, for the same-shape roofline)
  E. native int4 via convert inside jit (eager .astype(int4) RecursionErrors)
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N1, N2 = 8, 72


def chain_time(mm, x0, k):
    """mm: x[8,k] -> y[8,n]. Chain via y -> next x; report per-iter seconds."""

    def body(i, x):
        y = mm(x)                                   # [8, n] f32/bf16
        n = y.shape[-1]
        if n >= k:
            nx = y[:, :k]
        else:
            reps = -(-k // n)
            nx = jnp.tile(y, (1, reps))[:, :k]
        return (nx * jnp.bfloat16(1e-6)).astype(x0.dtype)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def run(x, n_iter):
        return jax.lax.fori_loop(0, n_iter, body, x)

    ts = {}
    for n_iter in (N1, N2):
        out = run(x0, n_iter=n_iter)
        _ = float(out.astype(jnp.float32)[0, 0])    # force real completion
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x0, n_iter=n_iter)
            _ = float(out.astype(jnp.float32)[0, 0])
            best.append(time.perf_counter() - t0)
        ts[n_iter] = min(best)
    return (ts[N2] - ts[N1]) / (N2 - N1)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    G = 128

    from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul
    from profile_w4b_kernels import w4_i8unpack

    for k, n in ((3584, 18944), (18944, 3584), (3584, 3584)):
        x0 = jnp.asarray(rng.normal(size=(8, k)), jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
        s = jnp.full((n,), 1e-3, jnp.float32)
        wp = jnp.asarray(rng.integers(-128, 128, size=(k // 2, n)), jnp.int8)
        gs = jnp.full((k // G, n), 1e-3, jnp.float32)
        i4_bytes = k * n / 2

        dt = chain_time(lambda x: jax.lax.dot_general(
            x, w8.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s, x0, k)
        print(f"[8,{k}]x[{k},{n}] D xla-int8        {dt*1e6:7.1f} us  "
              f"{k*n/dt/1e9:6.1f} GB/s(i8)", flush=True)

        dt = chain_time(lambda x: w4a16_matmul(x, wp, gs), x0, k)
        print(f"[8,{k}]x[{k},{n}] C cur(i32,bn512)  {dt*1e6:7.1f} us  "
              f"{i4_bytes/dt/1e9:6.1f} GB/s(i4)", flush=True)

        for bn in (512, 1024, 2048):
            if n % bn:
                continue
            for mg in (4, 8):
                try:
                    f = functools.partial(w4_i8unpack, block_n=bn, max_groups=mg)
                    dt = chain_time(lambda x: f(x, wp, gs), x0, k)
                    print(f"[8,{k}]x[{k},{n}] F i8,bn{bn},mg{mg}  {dt*1e6:7.1f} us  "
                          f"{i4_bytes/dt/1e9:6.1f} GB/s(i4)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"F bn{bn},mg{mg} failed: {type(e).__name__}", flush=True)

        try:
            @jax.jit
            def conv(w):
                return jax.lax.convert_element_type(w, jnp.int4)

            w4n = conv(jnp.clip(w8, -7, 7))
            dt = chain_time(lambda x: jax.lax.dot_general(
                x, w4n.astype(x.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s, x0, k)
            print(f"[8,{k}]x[{k},{n}] E native-int4     {dt*1e6:7.1f} us  "
                  f"{i4_bytes/dt/1e9:6.1f} GB/s(i4)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"E native-int4 failed: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
