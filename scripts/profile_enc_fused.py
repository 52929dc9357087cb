"""On-chip check + timing of the fused quant-epilogue encoder path (round 4).

Compares the three encoder variants at the real TTFT shape (20 windows,
32 layers, d=1280): bf16 dense, XLA-composed a8 (quantize_encoder_params),
fused-kernel a8 (quantize_encoder_params_fused + ops/pallas/enc_fused.py).

Run: python scripts/profile_enc_fused.py   (ONE TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import WhisperEncoderConfig
from audio_flamingo_tpu.models import whisper_encoder
from audio_flamingo_tpu.ops.quant import (quantize_encoder_params,
                                          quantize_encoder_params_fused)


def timed(fn, *args, n=3, tag=""):
    # block_until_ready RETURNS EARLY through the axon tunnel (CLAUDE.md);
    # only fetching a VALUE truly syncs. Dispatches run in-order on the device
    # stream, so (t_fetch - t0 - one 40 ms sync) / n bounds the per-call time.
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        times.append((time.perf_counter() - t0 - 0.04) / n)
    dt = float(np.median(times))
    print(f"{tag:30s} {dt*1e3:8.2f} ms", flush=True)
    return dt, out


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = WhisperEncoderConfig(use_flash=True)
    rng = np.random.default_rng(0)
    print("init encoder params...", flush=True)
    params = whisper_encoder.init(jax.random.PRNGKey(0), cfg)
    pb = jax.jit(lambda p: jax.tree.map(lambda x: x.astype(jnp.bfloat16), p))(params)
    p8 = jax.jit(quantize_encoder_params)(pb)
    pf = jax.jit(lambda p: quantize_encoder_params_fused(p, cfg.head_dim))(pb)
    jax.block_until_ready(pf["layers"]["qkv"]["w_q"])
    del params

    mels = jnp.asarray(rng.normal(size=(20, 3000, 128)) * 0.3, jnp.bfloat16)

    import dataclasses

    apply = jax.jit(lambda p, m: whisper_encoder.apply(p, cfg, m,
                                                       compute_dtype=jnp.bfloat16),
                    static_argnames=())
    print("compiling variants...", flush=True)
    d_b, y_b = timed(apply, pb, mels, tag="encoder bf16 dense")
    d_8, y_8 = timed(apply, p8, mels, tag="encoder a8 (XLA-composed)")
    d_f, y_f = None, None
    for stages in (("mlp",), ("qkv", "mlp"), ("qkv", "out", "mlp")):
        cfg_v = dataclasses.replace(cfg, fused_stages=stages)
        ap = jax.jit(lambda p, m, c=cfg_v: whisper_encoder.apply(
            p, c, m, compute_dtype=jnp.bfloat16))
        d_v, y_v = timed(ap, pf, mels, tag=f"encoder a8 fused {stages}")
        if d_f is None or d_v < d_f:
            d_f, y_f = d_v, y_v

    a = np.asarray(y_8, np.float32)
    b = np.asarray(y_f, np.float32)
    d = np.asarray(y_b, np.float32)
    rel_f8 = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    cos = float((d * b).sum() / (np.linalg.norm(d) * np.linalg.norm(b)))
    print(f"fused vs XLA-a8: max rel {rel_f8:.4f}; fused vs dense cos {cos:.5f}")
    print(f"speedup vs a8: {d_8/d_f:.2f}x, vs dense: {d_b/d_f:.2f}x")


if __name__ == "__main__":
    main()
