"""w4 probes round 3: XLA-fused unpack, per-call overhead, fused gate|up blocks.

P1. pure-XLA packed dot: shifts+convert+scale feeding dot_general — does XLA:TPU
    fuse the unpack chain into the dot operand stream (as it does int8 converts)?
P2. per-pallas_call fixed cost: chain 200 tiny [8,512]x[512,512] kernel calls.
P3. 28-layer pseudo-sweep: fused gate|up at bn 18944 / 9472 (mg 4) vs separate
    bn=full baseline.
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul

L, D, F, G = 28, 3584, 18944, 128


def chain_scalar(run, r_small, r_big):
    ts = {}
    for r in (r_small, r_big):
        out = run(r)
        _ = float(out.astype(jnp.float32).ravel()[0])
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(r)
            _ = float(out.astype(jnp.float32).ravel()[0])
            best.append(time.perf_counter() - t0)
        ts[r] = min(best)
    return (ts[r_big] - ts[r_small]) / (r_big - r_small)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # P1: pure-XLA packed unpack -> dot, chained, at the two big shapes
    for k, n in ((3584, 18944), (18944, 3584)):
        wp = jnp.asarray(rng.integers(-128, 128, size=(k // 2, n)), jnp.int8)
        gs = jnp.full((k // G, n), 1e-3, jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(8, k)), jnp.bfloat16)

        def mm(x, wp=wp, gs=gs, k=k):
            w32 = wp.astype(jnp.int32)
            lo = ((w32 << 28) >> 28)
            hi = ((w32 << 24) >> 28)
            wq = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)  # [k, n]
            srep = jnp.repeat(gs, G, axis=0).astype(jnp.bfloat16)
            y = jax.lax.dot_general(x, wq * srep, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y

        def body(i, x, mm=mm, k=k):
            y = mm(x)
            nn = y.shape[-1]
            nx = y[:, :k] if nn >= k else jnp.tile(y, (1, -(-k // nn)))[:, :k]
            return (nx * 1e-6).astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("r",))
        def runp(x, r, body=body):
            return jax.lax.fori_loop(0, r, body, x)

        dt = chain_scalar(lambda r: runp(x0, r=r), 8, 72)
        print(f"P1 xla-fused-unpack [8,{k}]x[{k},{n}]: {dt*1e6:7.1f} us  "
              f"{k*n/2/dt/1e9:6.1f} GB/s(i4)", flush=True)

    # P2: per-call fixed cost on tiny matmuls
    k, n = 512, 512
    wp = jnp.asarray(rng.integers(-128, 128, size=(k // 2, n)), jnp.int8)
    gs = jnp.full((k // G, n), 1e-3, jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(8, k)), jnp.bfloat16)

    def body2(i, x):
        y = w4a16_matmul(x, wp, gs, block_n=1 << 20)
        return (y * 1e-6).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("r",))
    def run2(x, r):
        return jax.lax.fori_loop(0, r, body2, x)

    dt = chain_scalar(lambda r: run2(x0, r=r), 20, 220)
    ideal = k * n / 2 / 819e9
    print(f"P2 tiny-call: {dt*1e6:.1f} us/call (DMA-ideal {ideal*1e6:.1f} us -> "
          f"fixed ~{(dt-ideal)*1e6:.1f} us)", flush=True)

    # P3: fused gate|up pseudo-sweep at moderate bn
    def mk(key, a, b):
        return {"w_p": jax.random.randint(key, (a // 2, b), -128, 128, jnp.int8),
                "gscale": jnp.full((a // G, b), 1e-3, jnp.float32)}

    layers = []
    for i in range(L):
        ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i), 3)
        layers.append({"qo": mk(ks[0], D, D), "gateup": mk(ks[1], D, 2 * F),
                       "down": mk(ks[2], F, D)})
    layers = jax.block_until_ready(layers)
    gb = L * (D * D + 3 * D * F) / 2 / 1e9
    x0 = jnp.asarray(rng.normal(size=(8, D)), jnp.bfloat16)

    for bn_gu in (18944, 9472):
        def sweep(ws, x, bn_gu=bn_gu):
            for lp in ws:
                x = x + w4a16_matmul(x, lp["qo"]["w_p"], lp["qo"]["gscale"],
                                     block_n=1 << 20)
                gu = w4a16_matmul(x, lp["gateup"]["w_p"], lp["gateup"]["gscale"],
                                  block_n=bn_gu)
                a = gu[:, :F] * gu[:, F:]
                x = x + w4a16_matmul(a, lp["down"]["w_p"], lp["down"]["gscale"],
                                     block_n=1 << 20)
                x = x * jnp.bfloat16(0.5)
            return x

        @functools.partial(jax.jit, static_argnames=("r",))
        def run3(ws, x, r, sweep=sweep):
            return jax.lax.fori_loop(0, r, lambda i, x: sweep(ws, x), x)

        try:
            dt = chain_scalar(lambda r: run3(layers, x0, r=r), 2, 8)
            print(f"P3 fused-gateup bn={bn_gu}: {dt*1e3:.2f} ms/sweep "
                  f"({gb/dt:.0f} GB/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P3 bn={bn_gu} failed: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
