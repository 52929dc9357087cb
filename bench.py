"""Benchmark harness: prints ONE JSON line (stdout) with the headline TPU metrics.

Metrics (BASELINE.md north stars):
- encode_rtfx_10min: audio-seconds/second/chip for the FULL AF-Whisper tower (32L x d1280,
  128 mel) in bf16 on a 10-min clip, including the fused Pallas mel frontend. Target 100x.
- decode_tps_af3_7b_int8_b1_1chip: decode tokens/s for the AF3-7B-shape LM on ONE chip,
  int8 weight-only (ops/quant.py; fits 16 GB HBM), batch 1, measured with the device-side
  lax.while_loop decode (one host sync total — the axon tunnel costs ~40 ms per sync, so
  host-loop decode is not representative). North star: >=30 tok/s/chip.

Progress goes to stderr (remote compiles take minutes on this setup); the single JSON
line is the last stdout line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_encoder() -> dict:
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
    from audio_flamingo_tpu.config import MelConfig, WhisperEncoderConfig
    from audio_flamingo_tpu.models import whisper_encoder

    cfg = WhisperEncoderConfig(use_flash=True)
    log("bench_encoder: init params...")
    params = whisper_encoder.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    _ = float(params["ln_post_w"].sum())

    fe = WhisperMelFrontend(MelConfig(num_mel_bins=128), use_pallas=True)
    audio_s = 600
    wav = jnp.asarray((np.random.default_rng(0).normal(size=(20, 480_000)) * 0.1)
                      .astype(np.float32))  # device-resident: time compute, not transfer

    log("bench_encoder: compile mel (pallas)...")
    mels = fe._window_mels(wav)
    _ = float(mels.sum())
    log("bench_encoder: compile encoder...")
    out = whisper_encoder.apply(params, cfg, mels.astype(jnp.bfloat16),
                                compute_dtype=jnp.bfloat16)
    _ = float(out.astype(jnp.float32).sum())

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        mels = fe._window_mels(wav)
        out = whisper_encoder.apply(params, cfg, mels.astype(jnp.bfloat16),
                                    compute_dtype=jnp.bfloat16)
        _ = float(out.astype(jnp.float32)[0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    log(f"bench_encoder: {dt*1e3:.0f} ms / 10 min -> RTFx {audio_s/dt:.0f}")
    return {"encode_rtfx_10min": audio_s / dt, "encode_s_10min": dt}


def bench_decode() -> dict:
    """AF3-7B-shape decode on ONE chip: int8 weight-only (fits 16 GB HBM, halves traffic)."""
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.ops.quant import random_quantized_lm

    cfg = Qwen2Config.qwen25_7b()
    log("bench_decode: init 7B int8 params on device...")
    params = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), cfg))()
    _ = float(params["ln_f_w"].astype(jnp.float32).sum())

    capacity = 1024
    n_steps = 64

    def decode_n(params, cache, token):
        def body(carry):
            cache, token, i = carry
            x = qwen2.embed(params, token[:, None], dtype=jnp.bfloat16)
            pos = jnp.full((1, 1), cache.index, jnp.int32)
            h, cache = qwen2.forward(params, cfg, x, pos, cache=cache)
            nxt = jnp.argmax(qwen2.unembed(params, cfg, h[:, 0]), axis=-1).astype(jnp.int32)
            return cache, nxt, i + 1

        def cond(carry):
            return carry[2] < n_steps

        cache, token, _ = jax.lax.while_loop(cond, body, (cache, token, jnp.zeros((), jnp.int32)))
        return cache, token

    decode_jit = jax.jit(decode_n, donate_argnums=1)
    log("bench_decode: compile decode while_loop...")
    cache = qwen2.init_cache(cfg, 1, capacity, dtype=jnp.bfloat16)
    token = jnp.zeros((1,), jnp.int32)
    cache, token = decode_jit(params, cache, token)
    _ = int(token[0])

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        cache, token = decode_jit(params, cache, token)
        _ = int(token[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_steps
    log(f"bench_decode: {dt*1e3:.2f} ms/token -> {1/dt:.1f} tok/s (7B int8, 1 chip)")
    return {"decode_tps_7b_int8_b1": 1 / dt, "decode_ms_per_tok": dt * 1e3,
            "decode_capacity": capacity}


def bench_ttft() -> dict:
    """p50 TTFT on a 10-min clip: mel -> encode -> 15k-token 7B-int8 prefill -> 1st token."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
    from audio_flamingo_tpu.config import AF3Config, MelConfig, Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import adaptor as adaptor_mod
    from audio_flamingo_tpu.models import af3, qwen2, whisper_encoder
    from audio_flamingo_tpu.ops.quant import random_quantized_lm

    enc_cfg = WhisperEncoderConfig(use_flash=True)
    lm_cfg = dataclasses.replace(Qwen2Config.qwen25_7b(), use_flash=True)
    log("bench_ttft: init encoder bf16 + 7B int8 LM...")
    enc_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                         whisper_encoder.init(jax.random.PRNGKey(0), enc_cfg))
    ada_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                         adaptor_mod.init(jax.random.PRNGKey(1), enc_cfg.d_model,
                                          lm_cfg.hidden_size))
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(2), lm_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())

    fe = WhisperMelFrontend(MelConfig(num_mel_bins=128), use_pallas=True)
    wav = jnp.asarray((np.random.default_rng(0).normal(size=(20, 480_000)) * 0.1)
                      .astype(np.float32))
    audio_id = 151_646
    ntok = 20 * 750
    prompt_len = ntok + 64
    cap = 16384
    ids = np.full((1, prompt_len), audio_id, np.int32)
    ids[0, ntok:] = 7
    ids_j = jnp.asarray(ids)

    @jax.jit
    def enc_fn(enc_p, ada_p, mels):
        h = whisper_encoder.apply(enc_p, enc_cfg, mels, compute_dtype=jnp.bfloat16)
        return adaptor_mod.apply(ada_p, h)

    @jax.jit
    def prefill_fn(lm_p, audio_embeds, ids):
        embeds = qwen2.embed(lm_p, ids, dtype=jnp.bfloat16)
        flat = audio_embeds.reshape(1, -1, lm_cfg.hidden_size)
        embeds = af3.scatter_audio_embeds(embeds, ids, flat, audio_id)
        pos = jnp.arange(prompt_len)[None]
        cache = qwen2.init_cache(lm_cfg, 1, cap, dtype=jnp.bfloat16)
        h, cache = qwen2.forward(lm_p, lm_cfg, embeds, pos, cache=cache)
        return jnp.argmax(qwen2.unembed(lm_p, lm_cfg, h[:, -1]), -1).astype(jnp.int32)

    log("bench_ttft: compiling...")

    def ttft():
        m = fe._window_mels(wav).astype(jnp.bfloat16)
        e = enc_fn(enc_p, ada_p, m)
        return int(prefill_fn(lm_p, e, ids_j)[0])

    _ = ttft()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = ttft()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    log(f"bench_ttft: {dt*1e3:.0f} ms to first token (10-min clip)")
    return {"ttft_10min_s": dt}


def main():
    enc = bench_encoder()
    dec = bench_decode()
    ttft = bench_ttft()
    rtfx = enc["encode_rtfx_10min"]
    line = {
        "metric": "encode_rtfx_10min",
        "value": round(rtfx, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(rtfx / 100.0, 3),  # target: >=100x realtime
        "secondary": {
            "decode_tps_af3_7b_int8_b1_1chip": round(dec["decode_tps_7b_int8_b1"], 2),
            "decode_ms_per_tok": round(dec["decode_ms_per_tok"], 3),
            "decode_vs_target_30tps": round(dec["decode_tps_7b_int8_b1"] / 30.0, 2),
            "encode_s_10min": round(enc["encode_s_10min"], 4),
            "p50_ttft_10min_s": round(ttft["ttft_10min_s"], 3),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
