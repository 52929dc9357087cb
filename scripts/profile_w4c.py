"""Does lax.scan over stacked w4 weights force per-layer slice COPIES into the
Pallas kernel? Compare a 28-layer matmul-only pseudo-model:

  A. lax.scan over stacked [L, Kp, N] packed weights (what qwen2.forward does)
  B. python-unrolled layers binding pre-sliced per-layer arrays (no in-graph slice)

Chained timing: R sweeps inside one jitted fori_loop; per-sweep time from the
difference of two R values (cancels the ~40 ms tunnel sync).
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_flamingo_tpu.ops.quant4 import q4_matmul

L, D, F, G = 28, 3584, 18944, 128


def make_stacked(rng):
    def mk(key, a, b):
        return {"w_p": jax.random.randint(key, (L, a // 2, b), -128, 128, jnp.int8),
                "gscale": jnp.full((L, a // G, b), 1e-3, jnp.float32)}

    ks = jax.random.split(rng, 4)
    return {"qo": mk(ks[0], D, D), "gate": mk(ks[1], D, F), "up": mk(ks[2], D, F),
            "down": mk(ks[3], F, D)}


def sweep_scan(params, x):
    def body(x, lp):
        x = x + q4_matmul(x, lp["qo"])
        a = q4_matmul(x, lp["gate"]) * q4_matmul(x, lp["up"])
        x = x + q4_matmul(a, lp["down"])
        return x * jnp.bfloat16(0.5), None

    x, _ = jax.lax.scan(body, x, params)
    return x


def sweep_unrolled(layers, x):
    for lp in layers:
        x = x + q4_matmul(x, lp["qo"])
        a = q4_matmul(x, lp["gate"]) * q4_matmul(x, lp["up"])
        x = x + q4_matmul(a, lp["down"])
        x = x * jnp.bfloat16(0.5)
    return x


def chain(fn, weights, x0, label):
    @functools.partial(jax.jit, static_argnames=("r",))
    def run(w, x, r):
        return jax.lax.fori_loop(0, r, lambda i, x: fn(w, x), x)

    ts = {}
    for r in (2, 8):
        out = run(weights, x0, r=r)
        _ = float(out.astype(jnp.float32)[0, 0])
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(weights, x0, r=r)
            _ = float(out.astype(jnp.float32)[0, 0])
            best.append(time.perf_counter() - t0)
        ts[r] = min(best)
    per = (ts[8] - ts[2]) / 6
    gb = L * (D * D + 3 * D * F) / 2 / 1e9
    print(f"{label}: {per*1e3:.2f} ms/sweep  ({gb:.2f} GB packed -> "
          f"{gb/per:.0f} GB/s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(8, D)), jnp.bfloat16)
    params = make_stacked(jax.random.PRNGKey(0))
    chain(sweep_scan, params, x0, "A scan-stacked ")

    layers = [jax.tree.map(lambda a, i=i: a[i], params) for i in range(L)]
    layers = jax.block_until_ready(layers)

    def fn(w, x):
        return sweep_unrolled(w, x)

    chain(fn, layers, x0, "B unrolled-presliced")


if __name__ == "__main__":
    main()
