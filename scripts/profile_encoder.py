"""Encoder MXU-utilization profile on the real chip (VERDICT #4), v2.

The axon tunnel makes block_until_ready unreliable and adds ~40 ms per host sync,
so every op is timed as N chained iterations inside ONE jitted fori_loop (data
dependency via output feedback) and synced by pulling one scalar.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from audio_flamingo_tpu.config import WhisperEncoderConfig
from audio_flamingo_tpu.models import whisper_encoder
from audio_flamingo_tpu.ops import gqa_attention
from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

N = 30


def sync(r):
    leaf = jax.tree.leaves(r)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def time_looped(make_loop, *args, n_iter=N, reps=3):
    f = jax.jit(make_loop)
    sync(f(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / n_iter


B, T, H, D = 20, 1500, 20, 64
DM, FFN, L = 1280, 5120, 32

rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16) * 0.1
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16) * 0.1
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16) * 0.1

attn_flops = 2 * 2 * B * H * T * T * D  # QK^T + PV

print("== attention at encoder shape [20,1500,20,64] bf16 ==", flush=True)


def attn_loop(attn_fn):
    def loop(q, k, v):
        def body(i, acc):
            return attn_fn(acc, k, v)
        return jax.lax.fori_loop(0, N, body, q)
    return loop


dt = time_looped(attn_loop(lambda q, k, v: gqa_attention(q, k, v, scale=1.0)), q, k, v)
print(f"xla gqa_attention     : {dt*1e3:7.3f} ms  {attn_flops/dt/1e12:6.1f} TF/s", flush=True)

for bq, bk in [(256, 2048), (512, 2048), (1536, 1536), (768, 1536), (128, 2048)]:
    fn = lambda q, k, v, bq=bq, bk=bk: flash_attention(q, k, v, scale=1.0,
                                                       block_q=bq, block_k=bk)
    dt = time_looped(attn_loop(fn), q, k, v)
    print(f"flash bq={bq:4d} bk={bk:4d}: {dt*1e3:7.3f} ms  "
          f"{attn_flops/dt/1e12:6.1f} TF/s", flush=True)

print("== gemm shapes ==", flush=True)
x2d = jax.random.normal(rng, (B * T, DM), jnp.bfloat16) * 0.1
w1 = jax.random.normal(rng, (DM, DM), jnp.bfloat16) * 0.02
w3 = jax.random.normal(rng, (DM, 3 * DM), jnp.bfloat16) * 0.02
wf1 = jax.random.normal(rng, (DM, FFN), jnp.bfloat16) * 0.02
wf2 = jax.random.normal(rng, (FFN, DM), jnp.bfloat16) * 0.02


def gemm3_loop(x, w):
    def body(i, acc):
        a, b, c = acc @ w, acc @ w, acc @ w
        return a + 1e-3 * (b - c)
    return jax.lax.fori_loop(0, N, body, x)


dt = time_looped(gemm3_loop, x2d, w1)
print(f"3 sep qkv gemms : {dt*1e3:7.3f} ms  {3*2*B*T*DM*DM/dt/1e12:6.1f} TF/s", flush=True)


def gemmf_loop(x, w):
    def body(i, acc):
        y = acc @ w                      # [BT, 3DM]
        return y[:, :DM] + y[:, DM:2 * DM] * 1e-3
    return jax.lax.fori_loop(0, N, body, x)


dt = time_looped(gemmf_loop, x2d, w3)
print(f"fused qkv gemm  : {dt*1e3:7.3f} ms  {2*B*T*DM*3*DM/dt/1e12:6.1f} TF/s", flush=True)


def mlp_loop(x, a, b):
    def body(i, acc):
        return jax.nn.gelu(acc @ a) @ b
    return jax.lax.fori_loop(0, N, body, x)


dt = time_looped(mlp_loop, x2d, wf1, wf2)
print(f"mlp fc1+gelu+fc2: {dt*1e3:7.3f} ms  {2*2*B*T*DM*FFN/dt/1e12:6.1f} TF/s", flush=True)

print("== full encoder (single dispatch, scalar sync; work >> sync) ==", flush=True)
per_tok = 4 * DM * DM + 2 * DM * FFN + 2 * T * D * H
total = 2 * (L * B * T * per_tok) + 2 * B * (3 * 128 * DM * 2 * T + 3 * DM * DM * T)
for flash in (True, False):
    cfg = WhisperEncoderConfig(use_flash=flash)
    params = whisper_encoder.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    mels = jax.random.normal(rng, (B, 2 * cfg.max_source_positions, cfg.num_mel_bins),
                             jnp.bfloat16) * 0.1
    fn = jax.jit(lambda p, m, cfg=cfg: whisper_encoder.apply(
        p, cfg, m, compute_dtype=jnp.bfloat16))
    sync(fn(params, mels))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(fn(params, mels))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"encoder use_flash={flash}: {dt*1e3:7.1f} ms  "
          f"{total/dt/1e12:6.1f} TF/s of ~197 peak  ({total/1e12:.1f} TFLOP)", flush=True)
