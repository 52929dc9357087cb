"""On-silicon w4a16 validation + decode measurement (ops/quant4.py).

1. Kernel parity on TPU: w4a16_matmul vs the XLA dequant reference at decode and
   7B-layer shapes (f32 activations, HIGHEST matmul precision on the reference side
   per CLAUDE.md rule 4).
2. 7B w4 decode steady state: bench.bench_decode_w4 (b1/b8, 1k/8k int8-KV caches).

Run alone (ONE TPU process): python scripts/hw_w4_check.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def parity():
    from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul
    from audio_flamingo_tpu.ops.quant4 import dequantize_w4, quantize_linear_w4

    rng = np.random.default_rng(0)
    for m, k, n in ((8, 3584, 3584), (8, 3584, 18944), (1, 18944, 3584),
                    (32, 3584, 512)):
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.float32)
        q = quantize_linear_w4(w)
        ref = jnp.matmul(x, dequantize_w4(q, jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        t0 = time.perf_counter()
        out = np.asarray(w4a16_matmul(x, q["w_p"], q["gscale"]))
        dt = time.perf_counter() - t0
        err = np.abs(out - np.asarray(ref)).max() / (np.abs(np.asarray(ref)).max() + 1e-9)
        status = "PASS" if err < 5e-3 else "FAIL"
        print(f"{status} w4a16 [{m},{k}]x[{k},{n}] rel_err={err:.2e} "
              f"(first-call {dt:.1f}s incl compile)", flush=True)
        assert err < 5e-3, (m, k, n, err)


def decode():
    import bench

    out = bench.bench_decode_w4()
    print("bench_decode_w4:", out, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    parity()
    decode()
