"""Where do the ~3 ms/layer between isolated flash (14.9 ms) and the in-layer
attention residual (layer 37.3 - matmuls 19.4 = 17.9 ms) go? Components timed
with the chained-fori methodology at the 10-min prefill shape.

Run: python scripts/profile_attn_residual.py  (ONE TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.ops import rope_cos_sin
from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention
from audio_flamingo_tpu.ops.rope import apply_rope

N = 20


def timed(fn, x, *rest, tag=""):
    @jax.jit
    def run(x, *rest):
        def body(i, carry):
            x, acc = carry
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
    print(f"{tag:44s} {float(np.median(times))*1e3:8.2f} ms", flush=True)
    return float(np.median(times))


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    T, nh, nkv, hd = 15360, 28, 4, 128
    cap = 16384
    q = jnp.asarray(rng.normal(size=(1, T, nh, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, T, nkv, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, T, nkv, hd)), jnp.bfloat16)
    pos = jnp.arange(T)[None]
    cos, sin = rope_cos_sin(pos, hd, 1e6, dtype=jnp.float32)
    kc = jnp.zeros((1, cap, nkv, hd), jnp.bfloat16)

    timed(lambda q: flash_attention(q, k, v, causal=True), q,
          tag="flash alone")
    timed(lambda q: apply_rope(q, k, cos, sin), q, tag="rope(q,k) alone")

    def rope_flash(q):
        qr, kr = apply_rope(q, k, cos, sin)
        return flash_attention(qr, kr, v, causal=True)
    timed(rope_flash, q, tag="rope + flash")

    def cache_write(q):
        kn = jax.lax.dynamic_update_slice(kc, k, (0, 0, 0, 0))
        vn = jax.lax.dynamic_update_slice(kc, v, (0, 0, 0, 0))
        return kn[:, :1].sum() + vn[:, :1].sum() + q.ravel()[0]
    timed(cache_write, q, tag="cache k/v write (16k buffers)")

    def full_attn_path(q):
        # the qwen2 prefill-with-cache composition: rope, write KV into the
        # 16k cache buffers, flash over the block's own (roped) KV, reshape
        qr, kr = apply_rope(q, k, cos, sin)
        kn = jax.lax.dynamic_update_slice(kc, kr, (0, 0, 0, 0))
        vn = jax.lax.dynamic_update_slice(kc, v, (0, 0, 0, 0))
        o = flash_attention(qr, kr, v, causal=True)
        return o.reshape(1, T, nh * hd), kn[:, :1].sum(), vn[:, :1].sum()
    timed(full_attn_path, q, tag="rope + cache-write + flash + reshape")


if __name__ == "__main__":
    main()
