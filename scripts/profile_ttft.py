"""Component breakdown of the 10-min TTFT a8 path at the real 7B shape.

Serial chip time = encode + prefill; this script times each part with the
fori_loop chaining methodology (CLAUDE.md rule 6) to find where the a8
prefill's time above the int8-matmul floor (~0.5 s) goes.

Run: python scripts/profile_ttft.py  (ONE TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=8, tag=""):
    """Chain iteration i's FIRST arg on iteration i-1's output (a zero tap) so
    XLA cannot hoist the loop body (profile_a8.py methodology)."""

    @jax.jit
    def run(x0, *rest):
        def body(i, carry):
            x, acc = carry
            y = fn(x, *rest)
            y0 = jax.tree.leaves(y)[0].ravel()[0]
            # y0*0 folds algebraically (XLA hoists the whole body); a tiny
            # multiplier survives simplification but underflows to 0 at runtime
            tap = jax.lax.convert_element_type(
                jax.lax.convert_element_type(y0, jnp.float32) * 1e-38, x.dtype)
            return x + tap, acc + jax.lax.convert_element_type(y0, jnp.float32)
        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    out = run(*args); jax.block_until_ready(out)  # compile+warm
    t0 = time.perf_counter()
    out = run(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0 - 0.04) / n
    print(f"{tag:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    print("device:", jax.devices()[0])
    from audio_flamingo_tpu.config import Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import qwen2, whisper_encoder
    from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention
    from audio_flamingo_tpu.ops.quant import random_quantized_lm

    rng = np.random.default_rng(0)
    T = 15360
    lm_cfg = dataclasses.replace(Qwen2Config.qwen25_7b(), use_flash=True,
                                 a8_prefill=True)
    d, f = lm_cfg.hidden_size, lm_cfg.intermediate_size
    nh, nkv, hd = lm_cfg.num_heads, lm_cfg.num_kv_heads, lm_cfg.resolved_head_dim()

    # 1. flash attention alone at the prefill shape (GQA 28q/4kv, causal)
    q = jnp.asarray(rng.normal(size=(1, T, nh, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, T, nkv, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, T, nkv, hd)), jnp.bfloat16)
    dt_fa = timed(lambda q, k, v: flash_attention(q, k, v, causal=True),
                  q, k, v, n=8, tag="flash attn [1,15360,28/4,128]")
    flops = 2 * 2 * T * T * nh * hd / 2
    print(f"{'':34s} -> {flops/dt_fa/1e12:6.1f} TF/s causal-adjusted; "
          f"x28 layers = {dt_fa*28*1e3:.0f} ms")

    # 2. one full a8 layer forward (matmuls + quant + rope + norms + flash)
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(2), lm_cfg))()
    jax.block_until_ready(lm_p["ln_f_w"])
    lp1 = jax.tree.map(lambda a: a[0], lm_p["layers"])
    x = jnp.asarray(rng.normal(size=(1, T, d)) * 0.1, jnp.bfloat16)
    from audio_flamingo_tpu.ops import rope_cos_sin
    cos, sin = rope_cos_sin(jnp.arange(T)[None], hd, lm_cfg.rope_theta,
                            dtype=jnp.float32)

    def layer_fn(x, lp):
        y, _ = qwen2._layer_forward(x, lp, lm_cfg, cos, sin, None, flash_ok=True)
        return y

    dt_l = timed(layer_fn, x, lp1, n=4, tag="one a8 layer fwd [1,15360,3584]")
    print(f"{'':34s} -> x28 layers = {dt_l*28*1e3:.0f} ms")

    # 3. the same layer with bf16 attention REPLACED by identity (matmul-only time)
    def layer_matmuls(x, lp):
        from audio_flamingo_tpu.ops.quant import q_matmul_a8, q_matmul_a8q, quantize_act
        from audio_flamingo_tpu.ops.norms import rms_norm
        h = rms_norm(x, lp["ln1_w"], lm_cfg.rms_norm_eps)
        hq = quantize_act(h)
        qq = q_matmul_a8q(*hq, lp["q"], out_dtype=x.dtype)
        kk = q_matmul_a8q(*hq, lp["k"], out_dtype=x.dtype)
        vv = q_matmul_a8q(*hq, lp["v"], out_dtype=x.dtype)
        attn = qq + jnp.pad(kk + vv, ((0, 0), (0, 0), (0, d - nkv * hd)))
        x = x + q_matmul_a8(attn, lp["o"])
        h = rms_norm(x, lp["ln2_w"], lm_cfg.rms_norm_eps)
        mlp = lp["mlp"]
        hq2 = quantize_act(h)
        act = (jax.nn.silu(q_matmul_a8q(*hq2, mlp["gate"], out_dtype=h.dtype))
               * q_matmul_a8q(*hq2, mlp["up"], out_dtype=h.dtype))
        return x + q_matmul_a8(act, mlp["down"])

    dt_m = timed(layer_matmuls, x, lp1, n=4, tag="a8 layer matmuls-only (no attn)")
    mm_flops = 2 * T * (2 * d * d + 2 * d * nkv * hd + 3 * d * f)
    print(f"{'':34s} -> {mm_flops/dt_m/1e12:6.1f} TOP/s; x28 = {dt_m*28*1e3:.0f} ms; "
          f"attn+rope residual = {(dt_l-dt_m)*28*1e3:.0f} ms/28L")

    # 4. encoder at 20 windows (bf16, flash)
    enc_cfg = WhisperEncoderConfig(use_flash=True)
    enc_p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         whisper_encoder.init(jax.random.PRNGKey(0), enc_cfg))
    mels = jnp.asarray(rng.normal(size=(20, 3000, 128)), jnp.bfloat16)
    dt_e = timed(lambda m, p: whisper_encoder.apply(p, enc_cfg, m,
                                                    compute_dtype=jnp.bfloat16),
                 mels, enc_p, n=3, tag="encoder 20 windows bf16")
    enc_flops = 20 * 1500 * 32 * 2 * (4 * 1280 * 1280 + 2 * 1280 * 5120) \
        + 20 * 32 * 4 * 1500 * 1500 * 1280
    print(f"{'':34s} -> {enc_flops/dt_e/1e12:6.1f} TF/s encoder-wide")

    # 5. encoder with int8 layer linears (w8a8, quantize_encoder_params)
    from audio_flamingo_tpu.ops.quant import quantize_encoder_params
    enc_p8 = jax.jit(quantize_encoder_params)(enc_p)
    jax.block_until_ready(enc_p8["layers"]["q"]["w_q"])
    dt_e8 = timed(lambda m, p: whisper_encoder.apply(p, enc_cfg, m,
                                                     compute_dtype=jnp.bfloat16),
                  mels, enc_p8, n=3, tag="encoder 20 windows a8")
    print(f"{'':34s} -> {enc_flops/dt_e8/1e12:6.1f} TOP/s-equiv encoder-wide")

    # 6. encoder flash attention alone at its shape [20, 1536, 20, 64]
    qe = jnp.asarray(rng.normal(size=(20, 1536, 20, 64)), jnp.bfloat16)
    dt_ef = timed(lambda q: flash_attention(q, q, q, scale=1.0, block_q=512,
                                            block_k=2048), qe, n=8,
                  tag="enc flash [20,1536,20,64]")
    ef_flops = 20 * 20 * 4 * 1536 * 1536 * 64
    print(f"{'':34s} -> {ef_flops/dt_ef/1e12:6.1f} TF/s; x32 = {dt_ef*32*1e3:.0f} ms")

    # 7. mel frontend on the 10-min wav
    from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
    from audio_flamingo_tpu.config import MelConfig
    fe = WhisperMelFrontend(MelConfig(num_mel_bins=128), use_pallas=True)
    wav = jnp.asarray(rng.normal(size=(20, 480_000)) * 0.1, jnp.float32)
    dt_mel = timed(lambda w: fe._window_mels(w).astype(jnp.bfloat16), wav, n=4,
                   tag="mel frontend 20 windows")


if __name__ == "__main__":
    main()
