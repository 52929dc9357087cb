"""Probe w4 decode-matmul strategies on the attached chip.

Decode matmuls are weight-bandwidth-bound; int4 halves int8's bytes only if the
unpack costs less than the bandwidth it saves. Candidates:
  A. XLA dot with native jnp.int4 storage (per-column scales)  — does XLA stream
     int4 and convert inside the fused dot like it does int8?
  B. XLA grouped batched-dot with native int4 (group scales, exact w4 semantics)
  C. current Pallas kernel (int32-shift unpack, per-group dots)
  D. XLA int8 dot baseline (what bench_decode rides today)

Times each at the 7B decode shapes with a chained-dispatch loop (CLAUDE.md rule 6).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

SHAPES = [(8, 3584, 18944), (8, 18944, 3584), (8, 3584, 3584)]
G = 128


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for m, k, n in SHAPES:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
        scale_col = jnp.full((n,), 1e-3, jnp.float32)
        gscale = jnp.full((k // G, n), 1e-3, jnp.float32)
        bytes_i8 = k * n
        bytes_i4 = k * n // 2

        # D. XLA int8 dot (today's decode path)
        @jax.jit
        def d_int8(x, w8, s):
            y = jax.lax.dot_general(x, w8.astype(x.dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y * s).astype(x.dtype)

        dt = timeit(d_int8, x, w8, scale_col)
        print(f"[{m},{k}]x[{k},{n}] D xla-int8      {dt*1e6:7.1f} us  "
              f"{bytes_i8/dt/1e9:6.1f} GB/s", flush=True)

        # A. XLA int4 dot, per-column scale
        try:
            w4 = jnp.clip(w8 // 16, -7, 7).astype(jnp.int4)

            @jax.jit
            def a_int4(x, w4, s):
                y = jax.lax.dot_general(x, w4.astype(x.dtype),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return (y * s).astype(x.dtype)

            dt = timeit(a_int4, x, w4, scale_col)
            print(f"[{m},{k}]x[{k},{n}] A xla-int4      {dt*1e6:7.1f} us  "
                  f"{bytes_i4/dt/1e9:6.1f} GB/s(i4)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"A xla-int4 failed: {type(e).__name__}: {e}", flush=True)

        # B. XLA grouped batched-dot int4 (exact w4 group semantics)
        try:
            w4g = jnp.clip(w8 // 16, -7, 7).astype(jnp.int4).reshape(k // G, G, n)

            @jax.jit
            def b_grouped(x, w4g, gs):
                xg = x.reshape(m, k // G, G).transpose(1, 0, 2)      # [g, m, G]
                y = jax.lax.dot_general(xg, w4g.astype(x.dtype),
                                        (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                return jnp.einsum("gmn,gn->mn", y, gs).astype(x.dtype)

            dt = timeit(b_grouped, x, w4g, gscale)
            print(f"[{m},{k}]x[{k},{n}] B xla-int4-grp  {dt*1e6:7.1f} us  "
                  f"{bytes_i4/dt/1e9:6.1f} GB/s(i4)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B xla-int4-grp failed: {type(e).__name__}: {e}", flush=True)

        # C. current Pallas kernel
        try:
            from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul

            w_p = jnp.asarray(rng.integers(-128, 128, size=(k // 2, n)), jnp.int8)
            dt = timeit(w4a16_matmul, x, w_p, gscale)
            print(f"[{m},{k}]x[{k},{n}] C pallas-cur    {dt*1e6:7.1f} us  "
                  f"{bytes_i4/dt/1e9:6.1f} GB/s(i4)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"C pallas-cur failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
