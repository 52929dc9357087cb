"""Per-kernel fused-vs-XLA profile, DEVICE-CHAINED timing (fori_loop with a
data-dependent tap — the only methodology the axon tunnel cannot lie to).

Run: python scripts/profile_enc_kernels.py  (ONE TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.ops.norms import layer_norm
from audio_flamingo_tpu.ops.pallas.enc_fused import enc_ln_qkv, enc_mlp, enc_out_ln
from audio_flamingo_tpu.ops.quant import q_matmul_a8q, quantize_act

N = 100


def timed(fn, x, *rest, tag="", flops=None):
    @jax.jit
    def run(x, *rest):
        def body(i, carry):
            x, acc = carry
            # tap EVERY output leaf — feeding only the first one lets XLA
            # dead-code-eliminate the other outputs' compute (k/v dots of the
            # 3-output qkv stage measured "694 TOP/s", beyond hardware peak)
            y0 = sum(jax.lax.convert_element_type(y.ravel()[0], jnp.float32)
                     for y in jax.tree.leaves(fn(x, *rest)))
            tap = jax.lax.convert_element_type(y0 * 1e-38, x.dtype)
            return x + tap, acc + y0
        _, acc = jax.lax.fori_loop(0, N, body, (x, jnp.float32(0)))
        return acc

    _ = float(run(x, *rest))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(x, *rest))
        times.append((time.perf_counter() - t0 - 0.04) / N)
    dt = float(np.median(times))
    rate = f"  {flops/dt/1e12:6.1f} TOP/s" if flops else ""
    print(f"{tag:36s} {dt*1e3:8.2f} ms{rate}", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    M, D, F = 30080, 1280, 5120
    x = jnp.asarray(rng.normal(size=(M, D)) * 0.3, jnp.bfloat16)
    lnw = jnp.ones((D,), jnp.float32)
    lnb = jnp.zeros((D,), jnp.float32)

    def qw(a, b):
        w = rng.normal(size=(a, b)) * 0.05
        s = np.maximum(np.abs(w).max(0), 1e-8) / 127.0
        return (jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8),
                jnp.asarray(s, jnp.float32))

    w3, s3 = qw(D, 3 * D)
    b3 = jnp.zeros((3 * D,), jnp.float32)
    wo, so = qw(D, D)
    bo = jnp.zeros((D,), jnp.float32)
    w1, s1 = qw(D, F)
    b1 = jnp.zeros((F,), jnp.float32)
    w2, s2 = qw(F, D)
    b2 = jnp.zeros((D,), jnp.float32)
    fl_qkv = 2 * M * D * 3 * D
    fl_o = 2 * M * D * D
    fl_mlp = 4 * M * D * F

    for bm in (128, 256, 512):
        try:
            timed(lambda x, bm=bm: enc_ln_qkv(x, lnw, lnb, w3, s3, b3,
                                              block_m=bm), x,
                  tag=f"fused ln+qkv (bm={bm})", flops=fl_qkv)
        except Exception as e:  # noqa: BLE001
            print(f"fused ln+qkv bm={bm} FAILED {type(e).__name__}", flush=True)

    def xla_qkv(x):
        h = layer_norm(x, lnw, lnb)
        hq = quantize_act(h)
        return (q_matmul_a8q(*hq, {"w_q": w3[:, :D], "scale": s3[:D]}),
                q_matmul_a8q(*hq, {"w_q": w3[:, D:2 * D], "scale": s3[D:2 * D]}),
                q_matmul_a8q(*hq, {"w_q": w3[:, 2 * D:], "scale": s3[2 * D:]}))
    timed(xla_qkv, x, tag="XLA ln+quant+qkv", flops=fl_qkv)

    attn = jnp.asarray(rng.normal(size=(M, D)) * 0.3, jnp.bfloat16)
    for bm in (128, 256, 512):
        try:
            timed(lambda a, x, bm=bm: enc_out_ln(a, x, wo, so, bo, lnw, lnb,
                                                 block_m=bm), attn, x,
                  tag=f"fused o+res+ln+quant (bm={bm})", flops=fl_o)
        except Exception as e:  # noqa: BLE001
            print(f"fused out_ln bm={bm} FAILED {type(e).__name__}", flush=True)

    def xla_out(a, x):
        x2 = x + q_matmul_a8q(*quantize_act(a), {"w_q": wo, "scale": so}) + bo
        h = layer_norm(x2, lnw, lnb)
        return x2, *quantize_act(h)
    timed(xla_out, attn, x, tag="XLA o+res+ln+quant", flops=fl_o)

    hq8, hs8 = quantize_act(layer_norm(x, lnw, lnb))
    hs8 = hs8.astype(jnp.float32)
    for bm, ft in ((64, 5120), (128, 5120), (64, 2560), (128, 2560), (64, 1280)):
        try:
            timed(lambda hq, hs, x, bm=bm, ft=ft: enc_mlp(
                hq, hs, w1, s1, b1, w2, s2, b2, x, block_m=bm, f_tile=ft),
                hq8, hs8, x, tag=f"fused mlp (bm={bm}, ft={ft})", flops=fl_mlp)
        except Exception as e:  # noqa: BLE001
            print(f"fused mlp bm={bm} ft={ft} FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    def xla_mlp(hq, hs, x):
        g = q_matmul_a8q(hq, hs, {"w_q": w1, "scale": s1}) + b1
        g = jax.nn.gelu(g.astype(jnp.float32), approximate=False)
        gq, gs = quantize_act(g.astype(jnp.bfloat16))
        return x + q_matmul_a8q(gq, gs, {"w_q": w2, "scale": s2}) + b2
    timed(xla_mlp, hq8, hs8, x, tag="XLA fc1+gelu+quant+fc2", flops=fl_mlp)


if __name__ == "__main__":
    main()
