"""Benchmark harness: prints ONE JSON line with the headline TPU metrics.

Primary metric: encoder RTFx on 10-min audio (BASELINE.json north star: >=100x realtime)
with the full-size AF-Whisper tower (32L x d1280, 128 mel) in bf16, including the mel
frontend. Secondary (same JSON object): decode tokens/s/chip for the largest Qwen2.5 LM
that fits one v5e chip in bf16, and p50 TTFT for a 30 s clip.

Run on the attached real TPU (default platform). Baselines: vs_baseline is measured
against the 100x-realtime encode target since the reference publishes no throughput
numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, *args, warmup: int = 2, iters: int = 5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_encoder_rtfx() -> dict:
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF3Config, MelConfig, WhisperEncoderConfig
    from audio_flamingo_tpu.audio import WhisperMelFrontend
    from audio_flamingo_tpu.models import af3

    cfg = AF3Config(
        encoder=WhisperEncoderConfig(),  # full AF-Whisper size: 32L, d1280, 128 mel
        lm=AF3Config.tiny().lm,          # LM unused here
    )
    params_enc = {"encoder": __import__(
        "audio_flamingo_tpu.models.whisper_encoder", fromlist=["init"]
    ).init(jax.random.PRNGKey(0), cfg.encoder)}
    from audio_flamingo_tpu.models import adaptor as adaptor_mod

    params_enc["adaptor"] = adaptor_mod.init(jax.random.PRNGKey(1), cfg.encoder.d_model,
                                             cfg.lm.hidden_size)
    params_enc = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                              params_enc)

    fe = WhisperMelFrontend(MelConfig(num_mel_bins=128))
    audio_s = 600
    wav = np.random.default_rng(0).normal(size=16000 * audio_s).astype(np.float32) * 0.1
    padded = fe.pad_or_trim(wav)

    @jax.jit
    def encode(wav_batch):
        mels = fe(wav_batch)                                  # [1, 20*3000, 128]
        nw = mels.shape[1] // 3000
        mels = mels.reshape(nw, 3000, 128)
        return af3.encode_audio(params_enc, cfg, mels, compute_dtype=jnp.bfloat16)

    dt = _timeit(encode, jnp.asarray(padded[None]))
    ttft_encode = _timeit(encode, jnp.asarray(padded[None][:, : 16000 * 30].reshape(1, -1)))
    return {"encode_rtfx_10min": audio_s / dt, "encode_s_10min": dt,
            "encode_s_30s_window": ttft_encode}


def bench_decode_tps() -> dict:
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config.qwen25_3b()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)

    # init directly in bf16 on device to stay inside HBM
    def bf16_init():
        p = qwen2.init(keys[0], cfg)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    params = jax.jit(bf16_init)()
    jax.block_until_ready(params)

    capacity = 2048
    cache = qwen2.init_cache(cfg, batch=1, capacity=capacity, dtype=jnp.bfloat16)

    @jax.jit
    def step(cache, token, position):
        x = qwen2.embed({"embed": params["embed"]}, token[:, None], dtype=jnp.bfloat16)
        h, cache = qwen2.forward(params, cfg, x, position[None, None], cache=cache)
        logits = qwen2.unembed(params, cfg, h[:, 0])
        return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    token = jnp.zeros((1,), jnp.int32)
    pos = jnp.asarray(0, jnp.int32)
    cache, token = step(cache, token, pos)  # compile
    jax.block_until_ready(token)

    n = 50
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        cache, token = step(cache, token, jnp.asarray(i, jnp.int32))
    jax.block_until_ready(token)
    dt = time.perf_counter() - t0
    return {"decode_tps_3b_bf16": n / dt, "decode_ms_per_tok": dt / n * 1e3,
            "decode_capacity": capacity}


def main():
    enc = bench_encoder_rtfx()
    dec = bench_decode_tps()
    rtfx = enc["encode_rtfx_10min"]
    line = {
        "metric": "encode_rtfx_10min",
        "value": round(rtfx, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(rtfx / 100.0, 3),  # target: >=100x realtime
        "secondary": {
            "decode_tps_qwen25_3b_b1": round(dec["decode_tps_3b_bf16"], 2),
            "decode_ms_per_tok": round(dec["decode_ms_per_tok"], 3),
            "encode_s_10min": round(enc["encode_s_10min"], 4),
            "encode_s_30s_window": round(enc["encode_s_30s_window"], 4),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
