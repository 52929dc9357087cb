"""w4 kernel block-shape sweep on the 28-layer pseudo-model (presliced weights).

profile_w4c.py showed ~58 us fixed cost per pallas_call at bn=512 (grid revisits
+ pipeline warmup). Full-N blocks turn each matmul into one pure-K stream;
max_groups sets the K block. Sweeps (block_n, max_groups) and also a gate|up
fused variant (one call for both F-wide matmuls).
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


def make_layers(rng):
    def mk(key, a, b):
        return {"w_p": jax.random.randint(key, (a // 2, b), -128, 128, jnp.int8),
                "gscale": jnp.full((a // G, b), 1e-3, jnp.float32)}

    out = []
    for i in range(L):
        ks = jax.random.split(jax.random.fold_in(rng, i), 4)
        out.append({"qo": mk(ks[0], D, D), "gate": mk(ks[1], D, F),
                    "up": mk(ks[2], D, F), "down": mk(ks[3], F, D),
                    "gateup": mk(ks[3], D, 2 * F)})
    return out


def chain(fn, weights, x0, label, gb):
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
    print(f"{label}: {per*1e3:.2f} ms/sweep  ({gb:.2f} GB -> {gb/per:.0f} GB/s)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(8, D)), jnp.bfloat16)
    layers = jax.block_until_ready(make_layers(jax.random.PRNGKey(0)))
    gb = L * (D * D + 3 * D * F) / 2 / 1e9
    gb_fused = L * (D * D + 4 * D * F) / 2 / 1e9   # gateup dup doubles gate/up bytes? no:
    # fused variant streams gateup (2F) + down => D*2F + F*D = 3DF, same as unfused

    for bn, mg in ((512, 4), (1 << 20, 4), (1 << 20, 8), (2048, 8)):
        mm = functools.partial(w4a16_matmul, block_n=bn, max_groups=mg)

        def sweep(ws, x, mm=mm):
            for lp in ws:
                x = x + mm(x, lp["qo"]["w_p"], lp["qo"]["gscale"])
                a = (mm(x, lp["gate"]["w_p"], lp["gate"]["gscale"])
                     * mm(x, lp["up"]["w_p"], lp["up"]["gscale"]))
                x = x + mm(a, lp["down"]["w_p"], lp["down"]["gscale"])
                x = x * jnp.bfloat16(0.5)
            return x

        try:
            chain(sweep, layers, x0, f"separate bn={bn} mg={mg}", gb)
        except Exception as e:  # noqa: BLE001
            print(f"separate bn={bn} mg={mg} failed: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    for bn, mg in ((1 << 20, 4), (1 << 20, 8)):
        mm = functools.partial(w4a16_matmul, block_n=bn, max_groups=mg)

        def sweep_fused(ws, x, mm=mm):
            for lp in ws:
                x = x + mm(x, lp["qo"]["w_p"], lp["qo"]["gscale"])
                gu = mm(x, lp["gateup"]["w_p"], lp["gateup"]["gscale"])
                a = gu[:, :F] * gu[:, F:]
                x = x + mm(a, lp["down"]["w_p"], lp["down"]["gscale"])
                x = x * jnp.bfloat16(0.5)
            return x

        try:
            chain(sweep_fused, layers, x0, f"gateup-fused bn={bn} mg={mg}", gb)
        except Exception as e:  # noqa: BLE001
            print(f"fused bn={bn} mg={mg} failed: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
