"""Hardware spot-check for the streaming flash kernel (round-3 rewrite):
correctness vs XLA attention at small shapes, the 16k-context shape that
VMEM-OOM'd the round-2 full-KV kernel, and encoder-shape timing."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")  # the XLA reference side must be pinned too (CLAUDE.md rule 4)

print("devices:", jax.devices(), flush=True)
from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention
from audio_flamingo_tpu.ops.attention import causal_mask, gqa_attention

def check(b, tq, tk, h, hkv, d, causal, q_offset=0, tol=2e-2):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, tq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, tk, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, tk, hkv, d)), jnp.bfloat16)
    out = jax.jit(lambda q,k,v: flash_attention(q,k,v,causal=causal,q_offset=q_offset))(q,k,v)
    mask = causal_mask(tq, tk, q_offset=q_offset) if causal else None
    ref = gqa_attention(q, k, v, mask=mask)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"fwd b{b} tq{tq} tk{tk} h{h}/{hkv} d{d} causal={causal} off={q_offset}: max|d|={err:.4f}", flush=True)
    assert err < tol, err

check(2, 256, 256, 8, 2, 64, False)
check(2, 256, 256, 8, 2, 64, True)
check(1, 384, 640, 4, 4, 128, True, q_offset=256)
check(1, 1500, 1500, 4, 4, 64, False)   # encoder shape (pad path)

# grads at moderate size
rng = np.random.default_rng(1)
q = jnp.asarray(rng.normal(size=(1, 512, 4, 64)), jnp.float32)
k = jnp.asarray(rng.normal(size=(1, 512, 2, 64)), jnp.float32)
v = jnp.asarray(rng.normal(size=(1, 512, 2, 64)), jnp.float32)
g1 = jax.jit(jax.grad(lambda q,k,v: flash_attention(q,k,v,causal=True).astype(jnp.float32).sum(), argnums=(0,1,2)))(q,k,v)
g2 = jax.jit(jax.grad(lambda q,k,v: gqa_attention(q,k,v,mask=causal_mask(512,512)).astype(jnp.float32).sum(), argnums=(0,1,2)))(q,k,v)
for a, b2, n in zip(g1, g2, "qkv"):
    err = float(jnp.max(jnp.abs(a - b2)))
    print(f"grad d{n}: max|d|={err:.5f}", flush=True)
    assert err < 2e-2, err

# the round-2 VMEM-OOM shape: 15360-token causal prefill, GQA 28/4 heads d128
q = jnp.asarray(np.random.default_rng(2).normal(size=(1, 15360, 28, 128)) * 0.1, jnp.bfloat16)
k = jnp.asarray(np.random.default_rng(3).normal(size=(1, 15360, 4, 128)) * 0.1, jnp.bfloat16)
v = jnp.asarray(np.random.default_rng(4).normal(size=(1, 15360, 4, 128)) * 0.1, jnp.bfloat16)
f = jax.jit(lambda q,k,v: flash_attention(q,k,v,causal=True))
out = f(q,k,v); _ = float(out.astype(jnp.float32)[0,0,0,0])
ts = []
for _ in range(3):
    t0 = time.perf_counter(); out = f(q,k,v); _ = float(out.astype(jnp.float32)[0,0,0,0])
    ts.append(time.perf_counter() - t0)
print(f"15360-causal GQA28/4 d128: {np.median(ts)*1e3:.1f} ms (round-2 kernel: VMEM OOM)", flush=True)

# encoder-shape timing (block sweep config used in whisper_encoder)
q = jnp.asarray(np.random.default_rng(5).normal(size=(20, 1500, 20, 64)) * 0.1, jnp.bfloat16)
f = jax.jit(lambda q: flash_attention(q, q, q, scale=1.0, block_q=512, block_k=2048))
out = f(q); _ = float(out.astype(jnp.float32)[0,0,0,0])
ts = []
for _ in range(5):
    t0 = time.perf_counter(); out = f(q); _ = float(out.astype(jnp.float32)[0,0,0,0])
    ts.append(time.perf_counter() - t0)
print(f"encoder attn 20x1500 h20 d64: {np.median(ts)*1e3:.2f} ms", flush=True)
print("HW_FLASH_OK", flush=True)
