"""Prototype: specialized encoder attention kernel (non-causal, single KV block,
bf16 softmax tail) vs the general flash kernel. Also head-pair packing via a
wider q tile (2 heads stacked in rows)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

N = 30
B, T, H, D = 20, 1500, 20, 64
TK = 1536  # padded

rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16) * 0.1
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16) * 0.1
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16) * 0.1
attn_flops = 2 * 2 * B * H * T * T * D


def sync(r):
    leaf = jax.tree.leaves(r)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def time_looped(fn, *args, reps=3):
    f = jax.jit(lambda q, k, v: jax.lax.fori_loop(0, N, lambda i, acc: fn(acc, k, v), q))
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N


def enc_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, soft_bf16):
    qv = q_ref[0]                                        # [bq, D]
    kv = k_ref[0]                                        # [tk, D]
    vv = v_ref[0]
    s = jax.lax.dot_general(qv, kv, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [bq, tk] f32
    if kv_len < kv.shape[0]:
        kid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kid < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    if soft_bf16:
        p = jnp.exp((s - m).astype(jnp.bfloat16))
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p, vv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    else:
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(jnp.bfloat16), vv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "soft_bf16"))
def enc_attention(q, k, v, *, bq=512, soft_bf16=True):
    b, tq, h, d = q.shape
    scale = 1.0  # caller pre-scales (whisper convention)
    tk_pad = -(-tq // 128) * 128
    tq_pad = -(-tq // bq) * bq
    qp = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - tq), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - tq), (0, 0), (0, 0)))
    qh = jnp.swapaxes(qp, 1, 2).reshape(b * h, tq_pad, d)
    kh = jnp.swapaxes(kp, 1, 2).reshape(b * h, tk_pad, d)
    vh = jnp.swapaxes(vp, 1, 2).reshape(b * h, tk_pad, d)
    kern = functools.partial(enc_kernel, kv_len=tq, soft_bf16=soft_bf16)
    out = pl.pallas_call(
        kern,
        grid=(b * h, tq_pad // bq),
        in_specs=[pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, tk_pad, d), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, tk_pad, d), lambda i, j: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d), q.dtype),
    )(qh, kh, vh)
    return jnp.swapaxes(out.reshape(b, h, tq_pad, d), 1, 2)[:, :tq]


# correctness check vs general flash
ref = flash_attention(q, k, v, scale=1.0, block_q=512, block_k=2048)
for soft in (False, True):
    got = enc_attention(q, k, v, soft_bf16=soft)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"enc_attention soft_bf16={soft}: max err vs flash = {err:.2e}", flush=True)

dt = time_looped(lambda q, k, v: flash_attention(q, k, v, scale=1.0,
                                                 block_q=512, block_k=2048), q, k, v)
print(f"general flash      : {dt*1e3:7.3f} ms  {attn_flops/dt/1e12:6.1f} TF/s", flush=True)
for soft in (False, True):
    for bq in (256, 512, 1536):
        fn = lambda q, k, v, bq=bq, soft=soft: enc_attention(q, k, v, bq=bq,
                                                             soft_bf16=soft)
        dt = time_looped(fn, q, k, v)
        print(f"enc bq={bq:4d} bf16={int(soft)}: {dt*1e3:7.3f} ms  "
              f"{attn_flops/dt/1e12:6.1f} TF/s", flush=True)
