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
import os
import sys
import time

import numpy as np

# Persistent executable cache: repeat bench runs (and `--only` re-measures)
# skip recompilation where the backend supports serialization. Harmless no-op
# if the axon backend declines to serialize; transparently correct otherwise.
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".jax_cache_tpu"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


_LAST_PROGRESS = [time.time()]


def log(msg: str) -> None:
    _LAST_PROGRESS[0] = time.time()
    print(msg, file=sys.stderr, flush=True)


def _start_watchdog(stall_minutes: float = 30.0) -> None:
    """Emit a degraded-but-parseable JSON line and exit if the bench stalls.

    A wedged device backend (e.g. the axon relay dying mid-round) blocks the
    first device op FOREVER with zero output; the driver then records nothing
    for the round. Every bench section logs progress through log(), so "no log
    line for `stall_minutes`" is a reliable stall signal.
    """
    import os
    import threading

    def watch():
        while True:
            time.sleep(60)
            idle = time.time() - _LAST_PROGRESS[0]
            if idle > stall_minutes * 60:
                print(json.dumps({
                    "metric": "encode_rtfx_10min", "value": 0.0,
                    "unit": "audio_s/s/chip", "vs_baseline": 0.0,
                    "secondary": {"error": f"bench stalled {idle/60:.0f} min "
                                           "without progress (device backend "
                                           "wedged?)"},
                }), flush=True)
                os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


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


def bench_decode_w4() -> dict:
    """7B w4a16 decode (ops/quant4.py): int4-packed layer linears (~3.8 GB vs int8's
    ~7.3 GB) through the Pallas nibble-unpack kernel. Decode is weight-bandwidth-
    bound, so this is the single-chip tokens/s headline lever beyond int8."""
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.ops.quant4 import random_quantized_lm_w4

    cfg = Qwen2Config.qwen25_7b()
    log("bench_decode_w4: init 7B w4 params on device...")
    params = jax.jit(lambda: random_quantized_lm_w4(jax.random.PRNGKey(0), cfg))()
    _ = float(params["ln_f_w"].astype(jnp.float32).sum())
    n_steps = 64
    results = {}

    for batch, cap in ((1, 1024), (1, 8192), (8, 1024)):
        def decode_n(params, cache, token, batch=batch):
            def body(carry):
                cache, token, i = carry
                x = qwen2.embed(params, token[:, None], dtype=jnp.bfloat16)
                pos = jnp.full((batch, 1), cache.index, jnp.int32)
                h, cache = qwen2.forward(params, cfg, x, pos, cache=cache)
                nxt = jnp.argmax(qwen2.unembed(params, cfg, h[:, 0]),
                                 axis=-1).astype(jnp.int32)
                return cache, nxt, i + 1

            cache, token, _ = jax.lax.while_loop(
                lambda c: c[2] < n_steps, body,
                (cache, token, jnp.zeros((), jnp.int32)))
            return cache, token

        key = f"w4_b{batch}_c{cap}"
        try:
            decode_jit = jax.jit(decode_n, donate_argnums=1)
            log(f"bench_decode_w4: compile b{batch} cap{cap}...")
            cache = qwen2.init_cache_q8(cfg, batch, cap)
            token = jnp.zeros((batch,), jnp.int32)
            cache, token = decode_jit(params, cache, token)
            _ = int(token[0])
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                cache, token = decode_jit(params, cache, token)
                _ = int(token[0])
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) / n_steps
            results[key] = round(batch / dt, 1)
            log(f"bench_decode_w4: {key}: {dt*1e3:.2f} ms/step -> "
                f"{batch/dt:.1f} tok/s total")
            del cache
        except Exception as e:  # noqa: BLE001
            log(f"bench_decode_w4: {key} failed: {type(e).__name__}")
            results[key] = None
    return {"decode_w4_tps": results}


def bench_decode_matrix() -> dict:
    """Decode tok/s matrix: batch {1,8,32} x cache capacity {1k,8k,16k}, int8 KV.

    The slot cache reads its whole padded capacity every step, so capacity (not
    fill level) sets the attention cost — each (batch, capacity) point is the
    steady-state decode rate for contexts up to that capacity. b32@16k is skipped:
    int8 weights (~7.6 GB) + 15 GB int8 KV exceed one v5e's 16 GB HBM.
    """
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.ops.quant import random_quantized_lm

    cfg = Qwen2Config.qwen25_7b()
    log("bench_decode_matrix: init 7B int8 params on device...")
    params = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), cfg))()
    _ = float(params["ln_f_w"].astype(jnp.float32).sum())
    n_steps = 32
    results = {}

    # points measured to exceed one v5e's HBM with int8 7B weights resident
    # (compile-time OOM: program temps + donated q8 cache + weights > 15.75G);
    # recorded as null without burning a doomed remote compile
    oom = {(8, 16384), (32, 8192), (32, 16384)}
    for batch in (1, 8, 32):
        for cap in (1024, 8192, 16384):
            if (batch, cap) in oom:
                results[f"b{batch}_c{cap}"] = None
                continue

            def decode_n(params, cache, token, batch=batch):
                def body(carry):
                    cache, token, i = carry
                    x = qwen2.embed(params, token[:, None], dtype=jnp.bfloat16)
                    pos = jnp.full((batch, 1), cache.index, jnp.int32)
                    h, cache = qwen2.forward(params, cfg, x, pos, cache=cache)
                    nxt = jnp.argmax(qwen2.unembed(params, cfg, h[:, 0]),
                                     axis=-1).astype(jnp.int32)
                    return cache, nxt, i + 1

                cache, token, _ = jax.lax.while_loop(
                    lambda c: c[2] < n_steps, body,
                    (cache, token, jnp.zeros((), jnp.int32)))
                return cache, token

            key = f"b{batch}_c{cap}"
            try:
                decode_jit = jax.jit(decode_n, donate_argnums=1)
                log(f"bench_decode_matrix: compile b{batch} cap{cap}...")
                cache = qwen2.init_cache_q8(cfg, batch, cap)
                token = jnp.zeros((batch,), jnp.int32)
                cache, token = decode_jit(params, cache, token)
                _ = int(token[0])
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    cache, token = decode_jit(params, cache, token)
                    _ = int(token[0])
                    times.append(time.perf_counter() - t0)
                dt = float(np.median(times)) / n_steps
                results[key] = round(batch / dt, 1)
                log(f"bench_decode_matrix: {key}: {dt*1e3:.2f} ms/step -> "
                    f"{batch/dt:.1f} tok/s total")
                del cache
            except Exception as e:  # noqa: BLE001 — e.g. HBM OOM at the largest point
                log(f"bench_decode_matrix: {key} failed: {type(e).__name__}")
                results[key] = None
    return results


def bench_paged_matrix() -> dict:
    """Fill the decode-matrix OOM holes through the paged int8 pool (VERDICT r2
    Next #3): b8 x 16k and b32 x 8k exceed HBM with the DENSE int8 cache (worst-case
    reservation + donated temps), but the paged pool maps only the pages a row
    actually uses and halves KV bytes — these cells measure steady-state decode
    tok/s through `paged_decode_chunk` at near-full contexts.
    """
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams, row_sampling
    from audio_flamingo_tpu.runtime.paged_cache import init_paged, paged_decode_chunk

    cfg = Qwen2Config.qwen25_7b()
    log("bench_paged_matrix: init 7B int8 params...")
    params = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), cfg))()
    _ = float(params["ln_f_w"].astype(jnp.float32).sum())
    bs = 128
    chunk = 8
    results = {}
    for batch, cap in ((8, 16384), (32, 8192)):
        key = f"b{batch}_c{cap}"
        try:
            n_pages_row = cap // bs
            num_blocks = batch * n_pages_row + 1
            log(f"bench_paged_matrix: {key}: {num_blocks} int8 blocks...")
            cache = init_paged(cfg, batch, num_blocks, bs, n_pages_row,
                               dtype=jnp.int8)
            tables = (1 + np.arange(batch * n_pages_row, dtype=np.int32)
                      ).reshape(batch, n_pages_row)
            start = cap - 4 * chunk - 2   # near-full contexts (the matrix point)
            cache = cache._replace(block_tables=jnp.asarray(tables),
                                   lengths=jnp.full((batch,), start, jnp.int32))
            rows = row_sampling([SamplingParams(greedy=True)] * batch)
            tokens = jnp.ones((batch,), jnp.int32)
            done = jnp.zeros((batch,), bool)
            rng = jax.random.PRNGKey(0)
            min_left = jnp.zeros((batch,), jnp.int32)
            log(f"bench_paged_matrix: compile {key}...")
            cache, tokens, done, rng, out, lp, _h = paged_decode_chunk(
                params, cfg, cache, tokens, done, rng, rows, min_left,
                chunk=chunk, eos_token_id=-1)
            _ = int(tokens[0])
            times = []
            for _i in range(2):
                t0 = time.perf_counter()
                cache, tokens, done, rng, out, lp, _h = paged_decode_chunk(
                    params, cfg, cache, tokens, done, rng, rows, min_left,
                    chunk=chunk, eos_token_id=-1)
                _ = int(tokens[0])
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) / chunk
            results[key] = round(batch / dt, 1)
            log(f"bench_paged_matrix: {key}: {dt*1e3:.2f} ms/step -> "
                f"{batch/dt:.1f} tok/s total")
            del cache
        except Exception as e:  # noqa: BLE001
            log(f"bench_paged_matrix: {key} failed: {type(e).__name__}: {e}")
            results[key] = None
    return {"paged_matrix_int8_tps": results}


def bench_longtail() -> dict:
    """Long-tail mixed workload (VERDICT r2 Weak #5): 512-token and 16k-token
    requests coexisting. The slot engine would need a 16k bf16 reservation on EVERY
    slot (4 x 16k x 28L x 4kv x 128hd x 2 x 2B = 58 GB — infeasible on one chip,
    recorded as null); the paged int8 pool serves the mix in ~2.3 GB of KV.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    lm_cfg = dataclasses.replace(Qwen2Config.qwen25_7b(), use_flash=True)
    cfg = AF3Config(lm=lm_cfg)
    log("bench_longtail: init 7B int8 params...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}
    rng = np.random.default_rng(0)
    max_new = 32

    def workload():
        reqs = []
        for i in range(3):
            reqs.append(Request(request_id=f"s{i}",
                                ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                                max_new_tokens=max_new))
        reqs.append(Request(request_id="tail",
                            ids=rng.integers(0, 150_000, (1, 16_000)).astype(np.int32),
                            max_new_tokens=max_new))
        return reqs

    def make():
        # pool: 16k tail + 3 x 1k short + growth ~ 160 int8 blocks (2.6 GB KV)
        return PagedEngine(params=params, cfg=cfg, num_rows=4, num_blocks=168,
                           block_size=128, max_blocks_per_seq=130, chunk=16,
                           kv_dtype=jnp.int8, eos_token_id=151_645,
                           sampling=SamplingParams(greedy=True))

    warm = make()
    for r in workload()[:1]:
        warm.submit(r)
    warm.submit(Request(request_id="wt",
                        ids=rng.integers(0, 150_000, (1, 16_000)).astype(np.int32),
                        max_new_tokens=4))
    warm.run_until_done()
    eng = make()
    for r in workload():
        eng.submit(r)
    t0 = time.perf_counter()
    results = eng.run_until_done()
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in results.values())
    tps = total / dt
    log(f"bench_longtail: paged-q8 {tps:.1f} tok/s ({total} tok / {dt:.1f} s); "
        "slot engine infeasible (58 GB reservation)")
    return {"longtail_paged_q8_tps": round(tps, 1),
            "longtail_slot_tps": None}


def bench_engines_mixed() -> dict:
    """Slot vs paged engine aggregate tok/s on a mixed 512/3.8k-prompt workload.

    The paged pool holds 88 blocks (11.3k tokens) vs the slot engine's 4x4096
    worst-case reservation (16.4k tokens) — the paged engine must match or beat
    slot throughput while using ~2/3 the KV memory (VERDICT #2 done criterion).
    (4x8192 bf16 slots + int8 7B weights exceed the 15.75 GB usable HBM of one
    v5e, so the mixed workload tops out at 4k contexts on a single chip.)
    """
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    lm_cfg = Qwen2Config.qwen25_7b()
    cfg = AF3Config(lm=lm_cfg)
    log("bench_engines_mixed: init 7B int8 params...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}

    rng = np.random.default_rng(0)
    max_new = 48

    def workload():
        reqs = []
        for i in range(3):
            reqs.append(Request(request_id=f"s{i}",
                                ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                                max_new_tokens=max_new))
            reqs.append(Request(request_id=f"l{i}",
                                ids=rng.integers(0, 150_000, (1, 3800)).astype(np.int32),
                                max_new_tokens=max_new))
        return reqs

    def run(engine_fn):
        # warmup instance triggers every compile (prefill buckets + decode chunk)
        warm = engine_fn()
        for r in workload()[:2]:
            warm.submit(r)
        warm.run_until_done()
        eng = engine_fn()
        reqs = workload()
        for r in reqs:
            eng.submit(r)
        t0 = time.perf_counter()
        results = eng.run_until_done()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        return total / dt, total, dt

    log("bench_engines_mixed: slot engine (4 x 4096 slots)...")
    slot_tps, n1, t1 = run(lambda: BatchEngine(
        params=params, cfg=cfg, num_slots=4, capacity=4096, chunk=16,
        eos_token_id=151_645, sampling=SamplingParams(greedy=True)))
    log(f"bench_engines_mixed: slot {slot_tps:.1f} tok/s ({n1} tok / {t1:.1f} s)")
    log("bench_engines_mixed: paged engine (88-block pool)...")
    paged_tps, n2, t2 = run(lambda: PagedEngine(
        params=params, cfg=cfg, num_rows=4, num_blocks=88, block_size=128,
        max_blocks_per_seq=32, chunk=16,
        eos_token_id=151_645, sampling=SamplingParams(greedy=True)))
    log(f"bench_engines_mixed: paged {paged_tps:.1f} tok/s ({n2} tok / {t2:.1f} s)")
    log("bench_engines_mixed: paged engine, int8 page pool (half the KV HBM)...")
    q8_tps, n3, t3 = run(lambda: PagedEngine(
        params=params, cfg=cfg, num_rows=4, num_blocks=88, block_size=128,
        max_blocks_per_seq=32, chunk=16, kv_dtype=jnp.int8,
        eos_token_id=151_645, sampling=SamplingParams(greedy=True)))
    log(f"bench_engines_mixed: paged-q8 {q8_tps:.1f} tok/s ({n3} tok / {t3:.1f} s)")
    return {"slot_tps_mixed": round(slot_tps, 1),
            "paged_tps_mixed": round(paged_tps, 1),
            "paged_vs_slot": round(paged_tps / slot_tps, 3),
            "paged_q8_tps_mixed": round(q8_tps, 1),
            "paged_q8_vs_slot": round(q8_tps / slot_tps, 3)}


def bench_prefix_cache() -> dict:
    """Prefix-cache TTFT: cold vs warm admit of a 3.8k text prompt (7B int8).

    Pool/engine geometry matches bench_engines_mixed so the cold-path executables
    are reused from the jit cache; the warm path adds only the suffix-prefill
    compile. Warm admits reuse 2048 prompt tokens (16 shared pages, the
    power-of-two hit bucket below 3800) — prefill work drops roughly in half and
    with audio prompts the whole encoder ride would be skipped too.
    """
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    lm_cfg = Qwen2Config.qwen25_7b()
    cfg = AF3Config(lm=lm_cfg)
    log("bench_prefix_cache: init 7B int8 params...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}

    eng = PagedEngine(params=params, cfg=cfg, num_rows=4, num_blocks=88,
                      block_size=128, max_blocks_per_seq=32, chunk=16,
                      eos_token_id=151_645, sampling=SamplingParams(greedy=True),
                      prefix_cache=True)
    rng = np.random.default_rng(0)

    def admit_time(ids):
        eng.submit(Request(request_id=f"p{rng.integers(1 << 30)}",
                           ids=ids, max_new_tokens=4))
        t0 = time.perf_counter()
        eng._admit()
        dt = time.perf_counter() - t0
        eng.run_until_done()
        return dt

    prompts = [rng.integers(0, 150_000, (1, 3800)).astype(np.int32) for _ in range(3)]
    log("bench_prefix_cache: compiling cold + warm paths...")
    admit_time(prompts[0])          # cold compile
    admit_time(prompts[0])          # warm compile (suffix prefill)
    cold = admit_time(prompts[1])   # measured cold (fresh prompt, compiled)
    admit_time(prompts[2])
    warm = admit_time(prompts[2])   # measured warm (shared prefix, compiled)
    log(f"bench_prefix_cache: cold {cold*1e3:.0f} ms, warm {warm*1e3:.0f} ms "
        f"({cold/warm:.2f}x)")
    return {"prefix_ttft_cold_s": round(cold, 3),
            "prefix_ttft_warm_s": round(warm, 3),
            "prefix_ttft_speedup": round(cold / warm, 2)}


def bench_spec_engine() -> dict:
    """Batch-8 speculative engine: MEASURED acceptance sweep (VERDICT r2 Next #1).

    Target 7B int8 + draft 0.5B bf16. Random weights give ~0 real draft/target
    agreement, so the sweep injects Bernoulli(a) acceptance into the REAL engine
    round (decode_spec_chunk accept_sim — every draft step, verify block and
    rollback still runs; only the comparison is simulated). Each point is a full
    workload run: measured tok/s, not a projection. A target-as-draft run (true
    acceptance == 1 by construction, 7B draft cost) bounds the integration
    overhead separately from the draft's cost.
    """
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.engine import BatchEngine, Request

    lm_cfg = Qwen2Config.qwen25_7b()
    draft_cfg = Qwen2Config.qwen25_0_5b()
    cfg = AF3Config(lm=lm_cfg)
    # int8 draft: the round-3 profile measured the bf16 0.5B draft step at 5.4 ms
    # (x4 per round = 21.7 ms vs 16.7 ms verify) — draft weight reads dominate the
    # round, so the draft gets the same w8a16 treatment as the target
    log("bench_spec_engine: init 7B int8 target + 0.5B int8 draft...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    draft_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(1), draft_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}

    rng = np.random.default_rng(0)
    # max_new=256: the r3 sweep generated only 48 tokens/request, so workload
    # numbers mostly measured prefill amortization (VERDICT r3 Weak #5) —
    # at 256 the workload ratio should track the decode-phase ratio.
    # spec_guard=False on every injected point: the acceptance GUARDRAIL would
    # (correctly) trip on a Bernoulli(0.6) prefix fraction of ~0.33 and flip
    # the engine to plain decode mid-run — here we measure what speculation
    # itself does, guard behavior has its own test + bench section.
    k, rounds, max_new = 4, 6, 256

    def run(kw):
        def make():
            return BatchEngine(params=params, cfg=cfg, num_slots=8, capacity=1024,
                               chunk=16, eos_token_id=151_645,
                               sampling=SamplingParams(greedy=True), **kw)
        warm = make()
        warm.submit(Request(request_id="w",
                            ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                            max_new_tokens=8))
        warm.run_until_done()
        eng = make()
        for i in range(8):
            eng.submit(Request(request_id=f"r{i}",
                               ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                               max_new_tokens=max_new))
        t0 = time.perf_counter()
        results = eng.run_until_done()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        return total / dt

    log("bench_spec_engine: plain chunked engine, batch 8...")
    plain_tps = run({})
    log(f"bench_spec_engine: plain {plain_tps:.1f} tok/s")
    out = {"plain_b8_tps": round(plain_tps, 1)}

    spec_kw = dict(draft_params=draft_p, draft_cfg=draft_cfg, spec_k=k,
                   spec_rounds=rounds, spec_guard=False)
    sweep = {}
    for a in (0.0, 0.6, 1.0):
        tps = run({**spec_kw, "spec_accept_sim": a})
        sweep[f"a{a}"] = round(tps, 1)
        log(f"bench_spec_engine: spec@a={a} {tps:.1f} tok/s "
            f"({tps/plain_tps:.2f}x plain)")
    out["spec_b8_tps_sweep"] = sweep
    out["spec_b8_vs_plain_a0.6"] = round(sweep["a0.6"] / plain_tps, 2)
    # theoretical ceiling at a=1 is (k+1)x the verify-only rate; report the
    # measured a=1 point against k+1 for the integration-overhead story
    out["spec_a1_fraction_of_k+1_bound"] = round(
        sweep["a1.0"] / (plain_tps * (k + 1)), 3)

    # SHALLOW draft (EAGLE/Medusa insight, TPU-native form): at small batch the
    # draft step is LAYER-LATENCY bound, not weight bound — the 24-layer 0.5B
    # draft costs 5.4 ms/step though its weights stream in ~0.7 ms. A 4-layer
    # wide draft cuts the serial chain 6x; spec economics need draft << verify.
    shallow_cfg = Qwen2Config(vocab_size=151_936, hidden_size=1280,
                              intermediate_size=6912, num_layers=4, num_heads=10,
                              num_kv_heads=2, tie_word_embeddings=True)
    shallow_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(2),
                                                    shallow_cfg))()
    _ = float(shallow_p["ln_f_w"].astype(jnp.float32).sum())
    sh_kw = dict(draft_params=shallow_p, draft_cfg=shallow_cfg, spec_k=k,
                 spec_rounds=rounds, spec_guard=False)
    sh = {}
    for a in (0.6, 1.0):
        tps = run({**sh_kw, "spec_accept_sim": a})
        sh[f"a{a}"] = round(tps, 1)
        log(f"bench_spec_engine: shallow-draft spec@a={a} {tps:.1f} tok/s "
            f"({tps/plain_tps:.2f}x plain)")
    out["spec_b8_tps_shallow_sweep"] = sh
    out["spec_shallow_vs_plain_a0.6"] = round(sh["a0.6"] / plain_tps, 2)

    log("bench_spec_engine: target-as-draft (true a=1, 7B draft cost)...")
    tad = run(dict(draft_params=lm_p, draft_cfg=lm_cfg, spec_k=k,
                   spec_rounds=rounds, spec_guard=False))
    out["spec_b8_tps_target_as_draft"] = round(tad, 1)
    log(f"bench_spec_engine: target-as-draft {tad:.1f} tok/s "
        f"({tad/plain_tps:.2f}x plain)")

    # DECODE-PHASE rates (chunk-level, one dispatch chain, no prefill/admission):
    # chunk-level steady-state rates with no prefill/admission at all — the
    # pure speculative-gain number to compare the 256-token workload against. Directly times decode_chunk vs
    # decode_spec_chunk (shallow draft) at batch 8.
    try:
        return {**out, **_spec_decode_phase(params, cfg, lm_cfg, shallow_p,
                                            shallow_cfg, k, rounds)}
    except Exception as e:  # noqa: BLE001
        log(f"bench_spec_engine: decode-phase section failed: {type(e).__name__}: {e}")
        return out


def _spec_decode_phase(params, cfg, lm_cfg, shallow_p, shallow_cfg, k, rounds) -> dict:
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.ops.sampling import SamplingParams, row_sampling
    from audio_flamingo_tpu.runtime.engine import (SlotCache, decode_chunk,
                                                   decode_spec_chunk,
                                                   init_slot_cache)

    out = {}
    b = 8
    afcfg = cfg

    # every phase gets FRESH cache buffers: decode_chunk/decode_spec_chunk DONATE
    # their caches, so reusing one `cache` object across phases reads deleted
    # buffers on TPU (the r3 decode-phase crash)
    def fresh_cache():
        c = init_slot_cache(lm_cfg, b, 1024, jnp.bfloat16)
        return SlotCache(c.k, c.v, jnp.full((b,), 500, jnp.int32))

    def fresh_draft():
        return init_slot_cache(shallow_cfg, b, 1024, jnp.bfloat16)

    tok = jnp.ones((b,), jnp.int32)
    rows_greedy = row_sampling([SamplingParams(greedy=True)] * b)
    min_left = jnp.zeros((b,), jnp.int32)

    log("bench_spec_engine: decode-phase plain chunk...")
    st = {"c": fresh_cache(), "t": tok, "d": jnp.zeros((b,), bool),
          "r": jax.random.PRNGKey(0)}

    def plain_step():
        c, t, d, r, out_, lp_, _h = decode_chunk(
            params, afcfg, st["c"], st["t"], st["d"], st["r"], rows_greedy,
            min_left, None, chunk=16, eos_token_id=-1)
        st["c"], st["t"], st["d"], st["r"] = c, t, d, r
        _ = int(t[0])

    plain_step()
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        plain_step()
        times.append(time.perf_counter() - t0)
    plain_dp = b * 16 / float(np.median(times))
    log(f"bench_spec_engine: decode-phase plain {plain_dp:.1f} tok/s")
    out["decode_phase_plain_b8_tps"] = round(plain_dp, 1)

    for a in (0.6, 0.8, 1.0):
        dc = fresh_draft()
        st2 = {"c": fresh_cache(), "dk": dc.k, "dv": dc.v,
               "t": tok, "d": jnp.zeros((b,), bool)}
        emitted = {"n": 0}

        def spec_step(a=a, st2=st2, emitted=emitted):
            c, dk, dv, t, d, out_, valid = decode_spec_chunk(
                params, shallow_p, afcfg, shallow_cfg,
                SlotCache(st2["c"].k, st2["c"].v,
                          jnp.full((b,), 500, jnp.int32)),
                st2["dk"], st2["dv"], t0k, st2["d"], jax.random.PRNGKey(1),
                k=k, rounds=rounds, eos_token_id=-1, accept_sim=a)
            st2["c"] = SlotCache(c.k, c.v, jnp.full((b,), 500, jnp.int32))
            st2["dk"], st2["dv"] = dk, dv
            emitted["n"] = int(np.asarray(valid).sum())
            _ = int(t[0])

        t0k = tok
        spec_step()
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            spec_step()
            times.append(time.perf_counter() - t0)
        dp = emitted["n"] / float(np.median(times))
        out[f"decode_phase_spec_shallow_a{a}_tps"] = round(dp, 1)
        out[f"decode_phase_spec_vs_plain_a{a}"] = round(dp / plain_dp, 2)
        log(f"bench_spec_engine: decode-phase spec@a={a} {dp:.1f} tok/s "
            f"({dp/plain_dp:.2f}x plain)")
    return out


def bench_spec_paged() -> dict:
    """Speculative decoding on the PAGED engine (int8 pool): the production
    cache composes with the measured-profitable speculation regime (a >= ~0.7,
    bench_spec_engine). Shallow int8 draft, batch 8, Bernoulli acceptance
    injection (paged_decode_spec_chunk accept_sim — all real compute runs)."""
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    lm_cfg = Qwen2Config.qwen25_7b()
    cfg = AF3Config(lm=lm_cfg)
    shallow_cfg = Qwen2Config(vocab_size=151_936, hidden_size=1280,
                              intermediate_size=6912, num_layers=4, num_heads=10,
                              num_kv_heads=2, tie_word_embeddings=True)
    log("bench_spec_paged: init 7B int8 target + 4-layer int8 draft...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    shallow_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(2),
                                                    shallow_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}
    rng = np.random.default_rng(0)
    k, rounds, max_new = 4, 6, 256   # >=256: workload ~ decode phase (r3 Weak #5)

    def run(kw):
        def make():
            return PagedEngine(params=params, cfg=cfg, num_rows=8,
                               num_blocks=80, block_size=128,
                               max_blocks_per_seq=8, chunk=16,
                               eos_token_id=151_645, kv_dtype=jnp.int8,
                               preempt=False,
                               sampling=SamplingParams(greedy=True), **kw)
        warm = make()
        warm.submit(Request(request_id="w",
                            ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                            max_new_tokens=8))
        warm.run_until_done()
        eng = make()
        for i in range(8):
            eng.submit(Request(request_id=f"r{i}",
                               ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                               max_new_tokens=max_new))
        t0 = time.perf_counter()
        results = eng.run_until_done()
        dt = time.perf_counter() - t0
        acc = getattr(eng, "spec_stats", {}).get("acceptance_est")
        return sum(len(v) for v in results.values()) / dt, acc

    plain, _ = run({})
    log(f"bench_spec_paged: plain paged int8 {plain:.1f} tok/s")
    out = {"paged_spec_plain_b8_tps": round(plain, 1)}
    sweep = {}
    for a in (0.6, 1.0):
        tps, acc = run(dict(draft_params=shallow_p, draft_cfg=shallow_cfg,
                            spec_k=k, spec_rounds=rounds, spec_accept_sim=a,
                            spec_guard=False))
        sweep[f"a{a}"] = round(tps, 1)
        # injection self-check: acceptance_est is the PREFIX fraction E[m]/k;
        # per-token Bernoulli(a) gives E[m] = sum_{i=1..k} a^i (0.326 at
        # a=0.6, 1.0 at a=1), with EOS/tail rounds biasing slightly low
        expect = sum(a ** i for i in range(1, k + 1)) / k
        log(f"bench_spec_paged: spec@a={a} {tps:.1f} tok/s ({tps/plain:.2f}x), "
            f"live acceptance_est={acc} (injected expectation {expect:.3f})")
    out["paged_spec_b8_tps_sweep"] = sweep
    out["paged_spec_vs_plain_a1.0"] = round(sweep["a1.0"] / plain, 2)
    return out


def bench_clap() -> dict:
    """AF1/AF2 frontend on the TPU scoreboard (VERDICT r3 #2): CLAP dual-bank
    fusion mel + full HTSAT tower over a 5-min clip (README.md:172 — AF2's
    headline capability), 30 x 10 s windows, bf16; plus the end-to-end AF2 TTFT
    (mel -> tower -> audio-transform -> 3B-int8 gated-xattn prefill -> token)."""
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, Qwen2Config
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.models.clap import ClapAudioTower
    from audio_flamingo_tpu.models.clap import init as clap_init
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.runtime.clap_processor import AF2Processor

    clap_cfg = ClapAudioConfig()                      # HTSAT-base, fusion on
    tower = ClapAudioTower(clap_cfg)
    log("bench_clap: init HTSAT tower (bf16)...")
    clap_p = jax.jit(lambda: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        clap_init(jax.random.PRNGKey(0), clap_cfg)))()
    _ = jax.block_until_ready(jax.tree.leaves(clap_p)[0])

    clip_s = 300
    wav = (np.random.default_rng(0).normal(size=48_000 * clip_s) * 0.1
           ).astype(np.float32)
    proc = AF2Processor(tokenizer=None, cfg=AF2Config(clap=clap_cfg))

    log("bench_clap: mel frontend (30 x 10 s windows, dual banks + fusion, "
        "device-resident)...")
    mels_j, longer_j = proc.windows_for_device(wav, out_dtype=jnp.bfloat16)
    _ = float(mels_j[0, 0, 0, 0].astype(jnp.float32))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        m, lg = proc.windows_for_device(wav, out_dtype=jnp.bfloat16)
        _ = float(m[0, 0, 0, 0].astype(jnp.float32))   # value fetch = true sync
        times.append(time.perf_counter() - t0)
    t_mel = float(np.median(times))
    log(f"bench_clap: mel {t_mel*1e3:.0f} ms ({mels_j.shape}, wav upload + "
        f"device chain, zero downloads)")
    log("bench_clap: HTSAT encode (30 windows)...")
    # block_until_ready returns EARLY through the tunnel (CLAUDE.md rule 6) —
    # only a value fetch truly syncs
    _ = float(tower.encode(clap_p, mels_j, longer_j)["embeds"][0, 0]
              .astype(jnp.float32))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(tower.encode(clap_p, mels_j, longer_j)["embeds"][0, 0]
                  .astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    t_tower = float(np.median(times))
    rtfx = clip_s / (t_mel + t_tower)
    log(f"bench_clap: tower {t_tower*1e3:.0f} ms -> frontend RTFx {rtfx:.0f}x")
    res = {"clap_mel_5min_s": round(t_mel, 3),
           "clap_tower_5min_s": round(t_tower, 3),
           "clap_frontend_rtfx_5min": round(rtfx, 1)}

    # ---- AF2 end-to-end TTFT: frontend + 3B-int8 xattn prefill ----
    lm_cfg = Qwen2Config.qwen25_3b()
    af2_cfg = AF2Config(clap=clap_cfg, lm=lm_cfg)
    log("bench_clap: init AF2-3B (int8 LM + bf16 fusion stacks)...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(1), lm_cfg))()
    fus_p = jax.jit(lambda: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        flamingo.init_fusion(jax.random.PRNGKey(2), af2_cfg)))()
    params = {**fus_p, "lm": lm_p}
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())

    prompt = np.random.default_rng(1).integers(0, 150_000, (1, 64)).astype(np.int32)
    prompt_j = jnp.asarray(prompt)

    # scale by 32767 (not 32768): a full-scale +1.0 sample would wrap to
    # -32768 under astype(int16); decode stays the standard /32768.
    wav16 = (np.clip(wav, -1, 1) * 32767).astype(np.int16)

    def af2_ttft(wav_in, phases=None):
        # device-resident chain (VERDICT r4 #3): the raw wav is the ONE
        # host->device transfer (~44 MB/s tunnel — upload bytes set the
        # floor); window split + _pad_short tiling + mel + fusion stack +
        # tower + xattn prefill all chain on device, and only the final
        # argmax token comes back. (The old path downloaded 30 MB of mels
        # from windows_for and re-uploaded them — ~75% of TTFT.)
        t0 = time.perf_counter()
        m, lg = proc.windows_for_device(wav_in, out_dtype=jnp.bfloat16)
        if phases is not None:
            _ = float(m[0, 0, 0, 0].astype(jnp.float32))
            phases["mel"] = time.perf_counter() - t0
        e = tower.encode(clap_p, m, lg)
        wins = e["embeds"].reshape(1, 1, -1, af2_cfg.audio_embed_dim)
        if phases is not None:
            _ = float(wins[0, 0, 0, 0].astype(jnp.float32))
            phases["tower"] = time.perf_counter() - t0 - phases["mel"]
        cache, media, lg2 = flamingo.prefill(params, af2_cfg, prompt_j, wins,
                                             capacity=1024,
                                             compute_dtype=jnp.bfloat16)
        return int(jnp.argmax(lg2[0]))

    log("bench_clap: compile AF2 prefill...")
    for key, wav_in in (("af2_ttft_5min_s", wav),
                        ("af2_ttft_5min_pcm16_s", wav16)):
        _ = af2_ttft(wav_in)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = af2_ttft(wav_in)
            times.append(time.perf_counter() - t0)
        phases = {}
        _ = af2_ttft(wav_in, phases)
        res[key] = round(float(np.median(times)), 3)
        log(f"bench_clap: AF2 TTFT (5-min clip, 3B int8, "
            f"{'int16 PCM' if wav_in.dtype == np.int16 else 'f32'} upload) "
            f"{res[key]*1e3:.0f} ms (mel+upload {phases['mel']*1e3:.0f}, "
            f"tower {phases['tower']*1e3:.0f} ms)")
    return res


def bench_xattn_engines() -> dict:
    """AF1/AF2 serving throughput (VERDICT r3 #2): slot vs paged xattn engines
    at the AF2-3B class (int8 LM + bf16 fusion), mixed 400/1500-token prompts
    each carrying a 30-window (5-min) media buffer; plus an AF1 OPT-1.3B
    interleaved-ICL generate (4 media x 4 windows, Flamingo 'last' masking)."""
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import (AF1Config, AF2Config, ClapAudioConfig,
                                           GatedXAttnConfig, Qwen2Config)
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.flamingo_engine import (FlamingoEngine,
                                                            FlamingoRequest)
    from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

    lm_cfg = Qwen2Config.qwen25_3b()
    cfg = AF2Config(clap=ClapAudioConfig(), lm=lm_cfg)
    log("bench_xattn_engines: init AF2-3B (int8 LM + bf16 fusion)...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    fus_p = jax.jit(lambda: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        flamingo.init_fusion(jax.random.PRNGKey(1), cfg)))()
    params = {**fus_p, "lm": lm_p}
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())

    rng = np.random.default_rng(0)
    wpm, max_new = 30, 64

    def workload():
        reqs = []
        for i in range(3):
            for tag, tlen in (("s", 400), ("l", 1500)):
                wins = rng.normal(size=(1, 1, wpm, cfg.audio_embed_dim)
                                  ).astype(np.float32) * 0.1
                reqs.append(FlamingoRequest(
                    request_id=f"{tag}{i}",
                    ids=rng.integers(0, 150_000, (1, tlen)).astype(np.int32),
                    window_embeds=wins, max_new_tokens=max_new))
        return reqs

    def run(engine_fn):
        warm = engine_fn()
        for r in workload()[:2]:
            warm.submit(r)
        warm.run_until_done()
        eng = engine_fn()
        reqs = workload()
        for r in reqs:
            eng.submit(r)
        t0 = time.perf_counter()
        results = eng.run_until_done()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        return total / dt, total, dt

    log("bench_xattn_engines: slot engine (4 x 2048 slots)...")
    slot_tps, n1, t1 = run(lambda: FlamingoEngine(
        params=params, cfg=cfg, num_slots=4, capacity=2048, chunk=16,
        eos_token_id=151_645, sampling=SamplingParams(greedy=True),
        compute_dtype=jnp.bfloat16, n_media=1, windows_per_media=wpm))
    log(f"bench_xattn_engines: slot {slot_tps:.1f} tok/s ({n1} tok / {t1:.1f} s)")
    log("bench_xattn_engines: paged xattn engine (56-block pool)...")
    paged_tps, n2, t2 = run(lambda: PagedFlamingoEngine(
        params=params, cfg=cfg, num_rows=4, num_blocks=56, block_size=128,
        max_blocks_per_seq=16, chunk=16, eos_token_id=151_645,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.bfloat16,
        n_media=1, windows_per_media=wpm))
    log(f"bench_xattn_engines: paged {paged_tps:.1f} tok/s ({n2} tok / {t2:.1f} s)")
    res = {"xattn_slot_tps": round(slot_tps, 1),
           "xattn_paged_tps": round(paged_tps, 1),
           "xattn_paged_vs_slot": round(paged_tps / slot_tps, 3)}
    del params, lm_p, fus_p
    import gc

    gc.collect()

    # ---- AF1: OPT-IML-1.3B + interleaved few-shot ICL prompt ----
    log("bench_xattn_engines: init AF1 (OPT-1.3B bf16 + fusion)...")
    af1_cfg = AF1Config.make(xattn=GatedXAttnConfig(cross_every_n_layers=2,
                                                    num_heads=32))
    af1_p = jax.jit(lambda: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        flamingo.init(jax.random.PRNGKey(2), af1_cfg)))()
    _ = jax.block_until_ready(jax.tree.leaves(af1_p)[0])

    b, n_media, wpm1, tlen = 4, 4, 4, 256
    ids = rng.integers(0, 50_000, (b, tlen)).astype(np.int32)
    wins = rng.normal(size=(b, n_media, wpm1, af1_cfg.audio_embed_dim)
                      ).astype(np.float32) * 0.1
    # interleaved ICL: tokens partitioned into 4 segments, each attending its clip
    media_idx = np.repeat(np.arange(n_media), tlen // n_media)[None].repeat(b, 0)

    def af1_gen():
        toks, lens = flamingo.generate(
            af1_p, af1_cfg, jnp.asarray(ids), jnp.asarray(wins),
            max_new_tokens=32, eos_token_id=-1,
            sampling=SamplingParams(greedy=True), rng=jax.random.PRNGKey(0),
            capacity=512, compute_dtype=jnp.bfloat16,
            text_media_idx=jnp.asarray(media_idx), media_mode="last")
        return jax.block_until_ready(toks), lens

    log("bench_xattn_engines: compile AF1 ICL generate...")
    toks, lens = af1_gen()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, lens = af1_gen()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    af1_tps = b * 32 / dt
    res["af1_icl_tps"] = round(af1_tps, 1)
    log(f"bench_xattn_engines: AF1 ICL {af1_tps:.1f} tok/s "
        f"(b{b}, 4x4 interleaved media)")
    return res


def bench_train() -> dict:
    """Training throughput on the chip (VERDICT r2 Next #2 — the L5 layer's first
    measured numbers):

    - train_stage1_*: AF3 stage-1 shape — adaptor-only training, FROZEN int8 7B LM +
      frozen bf16 AF-Whisper encoder, batch 4 x (750 audio + 64 text) tokens. Grads
      flow through the int8 LM to the adaptor only (value_and_grad over the adaptor
      arg; the frozen trees ride as non-diff arguments).
    - train_ft15_*: 1.5B full fine-tune — bf16 params, adafactor (the TPU-idiomatic
      memory-efficient optimizer), remat="dots", flash attention, batch 4 x 1024.
      Reports tokens/s, step ms, and achieved MFU (6*N*T flops over the v5e's
      197 TF/s bf16 peak).
    - train_ctx8k_*: context-extension shape (stage 3.5 / MF full-song): 1.5B,
      batch 1 x 8192 tokens, remat="full" — and the DENSE (remat off) variant's
      compile attempted once to document the OOM remat exists to fix.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.train.train_step import TrainState, train_step

    out = {}
    rng = np.random.default_rng(0)

    # ---- stage-1: adaptor-only over frozen int8 7B + bf16 encoder ----
    enc_cfg = WhisperEncoderConfig(use_flash=True)
    # remat="full": the "dots" policy SAVES each layer's f32 MLP dot outputs
    # (2 x [28, B, T, 18944] f32 = 13 GB at this shape — measured HBM OOM);
    # "full" keeps only layer-boundary residuals (~0.7 GB) and recomputes
    lm_cfg = dataclasses.replace(Qwen2Config.qwen25_7b(), use_flash=True,
                                 remat="full")
    cfg1 = AF3Config(encoder=enc_cfg, lm=lm_cfg)
    log("bench_train: stage-1 init (frozen int8 7B + bf16 encoder)...")
    from audio_flamingo_tpu.models import adaptor as adaptor_mod
    from audio_flamingo_tpu.models import whisper_encoder

    frozen = {
        "encoder": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                whisper_encoder.init(jax.random.PRNGKey(0), enc_cfg)),
        "lm": jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(1), lm_cfg))(),
    }
    adaptor_p = adaptor_mod.init(jax.random.PRNGKey(2), enc_cfg.d_model,
                                 lm_cfg.hidden_size)
    _ = float(frozen["lm"]["ln_f_w"].astype(jnp.float32).sum())

    b1, text = 4, 64
    ntok = 750
    t1 = ntok + text
    ids = np.full((b1, t1), cfg1.audio_token_id, np.int32)
    ids[:, ntok:] = rng.integers(0, 150_000, (b1, text))
    labels = np.where(ids == cfg1.audio_token_id, -100, ids).astype(np.int32)
    mels = rng.normal(size=(b1, 1, 3000, 128)).astype(np.float32) * 0.1

    opt1 = optax.adamw(1e-4)

    @jax.jit
    def stage1_step(adaptor_p, opt_state, frozen, ids, labels, mels):
        def loss_fn(ap):
            params = {"encoder": frozen["encoder"], "adaptor": ap,
                      "lm": frozen["lm"]}
            return af3.loss(params, cfg1, ids, labels, mels,
                            compute_dtype=jnp.bfloat16, ce_chunk=256)

        loss, grads = jax.value_and_grad(loss_fn)(adaptor_p)
        updates, opt_state = opt1.update(grads, opt_state, adaptor_p)
        return optax.apply_updates(adaptor_p, updates), opt_state, loss

    log("bench_train: compile stage-1 step...")
    opt_state = opt1.init(adaptor_p)
    ids_j, labels_j, mels_j = jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mels)
    adaptor_p, opt_state, loss = stage1_step(adaptor_p, opt_state, frozen,
                                             ids_j, labels_j, mels_j)
    _ = float(loss)
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        adaptor_p, opt_state, loss = stage1_step(adaptor_p, opt_state, frozen,
                                                 ids_j, labels_j, mels_j)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    out["train_stage1_step_ms"] = round(dt * 1e3, 1)
    out["train_stage1_tokens_per_s"] = round(b1 * t1 / dt, 1)
    log(f"bench_train: stage-1 {dt*1e3:.0f} ms/step -> {b1*t1/dt:.0f} tok/s")
    del frozen, adaptor_p, opt_state

    # ---- 1.5B full fine-tune: bf16 + adafactor + remat=dots + flash ----
    from audio_flamingo_tpu.models import qwen2 as qwen2_mod

    ft_cfg_lm = dataclasses.replace(Qwen2Config.qwen25_1_5b(), use_flash=True,
                                    remat="full")
    tiny_enc = WhisperEncoderConfig(num_mel_bins=16, d_model=64, num_layers=2,
                                    num_heads=4, ffn_dim=128)
    ft_cfg = AF3Config(encoder=tiny_enc, lm=ft_cfg_lm)
    log("bench_train: init 1.5B bf16...")
    ft_params = {
        "encoder": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                whisper_encoder.init(jax.random.PRNGKey(3), tiny_enc)),
        "adaptor": jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            adaptor_mod.init(jax.random.PRNGKey(4), tiny_enc.d_model,
                             ft_cfg_lm.hidden_size)),
        "lm": jax.jit(lambda: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            qwen2_mod.init(jax.random.PRNGKey(5), ft_cfg_lm)))(),
    }
    n_lm = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(ft_params["lm"]))
    _ = float(ft_params["lm"]["ln_f_w"].astype(jnp.float32).sum())
    opt = optax.adafactor(1e-3)
    state = TrainState(ft_params, opt.init(ft_params), jnp.zeros((), jnp.int32))

    b2, t2 = 4, 1024
    ft_ids = jnp.asarray(rng.integers(0, 151_000, (b2, t2)), jnp.int32)
    batch = {"ids": ft_ids, "labels": ft_ids, "mels": None}
    step_fn = jax.jit(lambda s, bt: train_step(s, bt, cfg=ft_cfg, opt=opt,
                                               compute_dtype=jnp.bfloat16,
                                               ce_chunk=512),
                      donate_argnums=0)
    log("bench_train: compile 1.5B full-FT step...")
    state, m = step_fn(state, batch)
    _ = float(m["loss"])
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    flops = 6.0 * n_lm * (b2 * t2)
    mfu = flops / dt / 197e12
    out["train_ft15_step_ms"] = round(dt * 1e3, 1)
    out["train_ft15_tokens_per_s"] = round(b2 * t2 / dt, 1)
    out["train_ft15_mfu"] = round(mfu, 3)
    log(f"bench_train: 1.5B FT {dt*1e3:.0f} ms/step -> {b2*t2/dt:.0f} tok/s, "
        f"MFU {mfu:.2%}")

    # ---- context-extension shape: 1x8192 remat=full; dense variant documented ----
    cx_lm = dataclasses.replace(ft_cfg_lm, remat="full")
    cx_cfg = AF3Config(encoder=tiny_enc, lm=cx_lm)
    b3, t3 = 1, 8192
    cx_ids = jnp.asarray(rng.integers(0, 151_000, (b3, t3)), jnp.int32)
    cx_batch = {"ids": cx_ids, "labels": cx_ids, "mels": None}
    cx_step = jax.jit(lambda s, bt: train_step(s, bt, cfg=cx_cfg, opt=opt,
                                               compute_dtype=jnp.bfloat16,
                                               ce_chunk=512),
                      donate_argnums=0)
    log("bench_train: compile 8k-context step (remat=full)...")
    state, m = cx_step(state, cx_batch)
    _ = float(m["loss"])
    times = []
    for _i in range(2):
        t0 = time.perf_counter()
        state, m = cx_step(state, cx_batch)
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    out["train_ctx8k_step_ms"] = round(dt * 1e3, 1)
    out["train_ctx8k_tokens_per_s"] = round(b3 * t3 / dt, 1)
    out["train_ctx8k_mfu"] = round(6.0 * n_lm * (b3 * t3) / dt / 197e12, 3)
    log(f"bench_train: 8k-ctx remat=full {dt*1e3:.0f} ms/step -> "
        f"{b3*t3/dt:.0f} tok/s")
    # dense (no-remat) 8k variant: document the memory gap via compiled memory
    # analysis; an OOM at compile is the expected outcome remat exists to fix
    try:
        dn_cfg = AF3Config(encoder=tiny_enc,
                           lm=dataclasses.replace(ft_cfg_lm, remat="none"))
        dn_step = jax.jit(lambda s, bt: train_step(s, bt, cfg=dn_cfg, opt=opt,
                                                   compute_dtype=jnp.bfloat16,
                                                   ce_chunk=512),
                          donate_argnums=0)
        compiled = dn_step.lower(state, cx_batch).compile()
        ma = compiled.memory_analysis()
        out["train_ctx8k_dense_temp_gb"] = round(
            ma.temp_size_in_bytes / 2**30, 2) if ma else None
        log(f"bench_train: dense 8k compiles; temp "
            f"{out['train_ctx8k_dense_temp_gb']} GB")
    except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED is the point
        out["train_ctx8k_dense_temp_gb"] = f"OOM:{type(e).__name__}"
        log(f"bench_train: dense 8k variant fails to fit ({type(e).__name__}) — "
            "remat=full is the enabler")
    return out


def bench_train_mm() -> dict:
    """Measured MULTIMODAL training steps (VERDICT r3 #3 — the round-3 training
    numbers were LM-only):

    - train_stage2_*: the AF3 stage-2 shape (static/af3_main_diagram-1.png) —
      full 32-layer bf16 AF-Whisper HOT (flash fwd + fused bwd at the
      3000-frame window shape) + adaptor, REAL mels in the batch, gradients
      back through the frozen int8 7B LM, remat=full, adafactor.
    - train_qlora7b_*: the single-chip 7B training recipe — int8 frozen base +
      rank-16 LoRA adapters (ops.lora.partition_lora: adapters are the only
      differentiable argument), remat=full, adamw on the adapter leaves.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import adaptor as adaptor_mod
    from audio_flamingo_tpu.models import af3, qwen2, whisper_encoder
    from audio_flamingo_tpu.ops.lora import add_lora, partition_lora
    from audio_flamingo_tpu.ops.quant import random_quantized_lm

    out = {}
    rng = np.random.default_rng(0)

    # ---- stage-2: encoder-hot multimodal step ----
    enc_cfg = WhisperEncoderConfig(use_flash=True, remat="full")
    lm_cfg = dataclasses.replace(Qwen2Config.qwen25_7b(), use_flash=True,
                                 remat="full")
    cfg = AF3Config(encoder=enc_cfg, lm=lm_cfg)
    log("bench_train_mm: init (bf16 encoder HOT + frozen int8 7B)...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    train = {
        "encoder": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                whisper_encoder.init(jax.random.PRNGKey(1), enc_cfg)),
        "adaptor": jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            adaptor_mod.init(jax.random.PRNGKey(2), enc_cfg.d_model,
                             lm_cfg.hidden_size)),
    }
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    n_enc = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(train["encoder"]))

    b, text = 4, 64
    ntok = 750
    t = ntok + text
    ids = np.full((b, t), cfg.audio_token_id, np.int32)
    ids[:, ntok:] = rng.integers(0, 150_000, (b, text))
    labels = np.where(ids == cfg.audio_token_id, -100, ids).astype(np.int32)
    mels = rng.normal(size=(b, 1, 3000, 128)).astype(np.float32) * 0.1
    opt = optax.adafactor(2e-5)

    @jax.jit
    def stage2_step(train, opt_state, lm_p, ids, labels, mels):
        def loss_fn(tr):
            params = {"encoder": tr["encoder"], "adaptor": tr["adaptor"],
                      "lm": lm_p}
            return af3.loss(params, cfg, ids, labels, mels,
                            compute_dtype=jnp.bfloat16, ce_chunk=256)

        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = opt.update(grads, opt_state, train)
        return optax.apply_updates(train, updates), opt_state, loss

    log("bench_train_mm: compile stage-2 step (encoder flash bwd)...")
    opt_state = opt.init(train)
    args = (jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mels))
    train, opt_state, loss = stage2_step(train, opt_state, lm_p, *args)
    _ = float(loss)
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        train, opt_state, loss = stage2_step(train, opt_state, lm_p, *args)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    # encoder fwd+bwd (weight grads): ~3x fwd FLOPs at the window shape
    enc_flops = 3.0 * (2 * n_enc * b * 1500 + 4 * b * 32 * 1500 * 1500 * 1280)
    out["train_stage2_step_ms"] = round(dt * 1e3, 1)
    out["train_stage2_tokens_per_s"] = round(b * t / dt, 1)
    out["train_stage2_audio_s_per_s"] = round(b * 30.0 / dt, 1)
    out["train_stage2_enc_mfu"] = round(enc_flops / dt / 197e12, 3)
    log(f"bench_train_mm: stage-2 {dt*1e3:.0f} ms/step, {b*t/dt:.0f} tok/s, "
        f"{b*30/dt:.1f} audio-s/s, enc-MFU~{enc_flops/dt/197e12:.1%}")
    del train, opt_state

    # ---- QLoRA 7B: adapters over the same frozen int8 base ----
    log("bench_train_mm: QLoRA-7B init (rank-16 adapters on int8 base)...")
    # EAGER add_lora: the adapters are small fresh arrays and the int8 base
    # leaves pass through BY REFERENCE — jitting this returns a full copy of
    # the 7 GB base (jit outputs are fresh buffers) and HBM-OOMs the step
    adapted_lm = add_lora(jax.random.PRNGKey(3), lm_p, rank=16)
    lora_leaves, base_leaves, rebuild = partition_lora(adapted_lm)
    del adapted_lm, lm_p
    q_opt = optax.adamw(1e-4)
    b2, t2 = 4, 1024
    q_ids = jnp.asarray(rng.integers(0, 150_000, (b2, t2)), jnp.int32)

    # chunked CE via af3.loss (ce_chunk): the full-vocab f32 logits tensor at
    # [4, 1024, 152k] is ~2.5 GB and its softmax backward doubles it — with
    # the 7 GB int8 base resident that HBM-OOMs; the chunked CE never
    # materializes it (same trick as every other training bench here)
    q_tiny_enc = WhisperEncoderConfig(num_mel_bins=16, d_model=64, num_layers=2,
                                      num_heads=4, ffn_dim=128)
    q_cfg = AF3Config(encoder=q_tiny_enc, lm=lm_cfg)
    q_aux = {
        "encoder": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                whisper_encoder.init(jax.random.PRNGKey(9),
                                                     q_tiny_enc)),
        "adaptor": jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            adaptor_mod.init(jax.random.PRNGKey(10), q_tiny_enc.d_model,
                             lm_cfg.hidden_size)),
    }

    @jax.jit
    def qlora_step(lora_vals, opt_state, base_vals, aux, ids):
        def loss_fn(lv):
            params3 = {**aux, "lm": rebuild(lv, base_vals)}
            return af3.loss(params3, q_cfg, ids, ids, None,
                            compute_dtype=jnp.bfloat16, ce_chunk=256)

        loss, g = jax.value_and_grad(loss_fn)(lora_vals)
        updates, opt_state = q_opt.update(g, opt_state, lora_vals)
        return optax.apply_updates(lora_vals, updates), opt_state, loss

    log("bench_train_mm: compile QLoRA step...")
    q_state = q_opt.init(lora_leaves)
    lora_leaves, q_state, loss = qlora_step(lora_leaves, q_state, base_leaves,
                                            q_aux, q_ids)
    _ = float(loss)
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        lora_leaves, q_state, loss = qlora_step(lora_leaves, q_state,
                                                base_leaves, q_aux, q_ids)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    n_lm = 7_070_000_000
    out["train_qlora7b_step_ms"] = round(dt * 1e3, 1)
    out["train_qlora7b_tokens_per_s"] = round(b2 * t2 / dt, 1)
    # fwd + input-grad backward sweeps the full base; weight grads only on
    # adapters -> ~4*N*T of base FLOPs per token (vs 6*N*T full FT)
    out["train_qlora7b_mfu"] = round(4.0 * n_lm * b2 * t2 / dt / 197e12, 3)
    log(f"bench_train_mm: QLoRA-7B {dt*1e3:.0f} ms/step -> {b2*t2/dt:.0f} tok/s "
        f"(base-MFU~{out['train_qlora7b_mfu']:.1%})")
    return out


def bench_grpo() -> dict:
    """GRPO on the chip (VERDICT r3 #4 — Music Flamingo's training mode,
    static/MF-architecture.png): one full iteration at 1.5B with rollouts
    riding the PAGED serving engine (make_engine_rollout) — G=8 sampled
    completions of an audio prompt (real mels through the full bf16 encoder,
    prefix cache shares the prompt pages), rewards, group advantages, PPO-clip
    + k3-KL update vs a frozen reference policy, adafactor."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import adaptor as adaptor_mod
    from audio_flamingo_tpu.models import af3, qwen2, whisper_encoder
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine
    from audio_flamingo_tpu.train.grpo import (GRPOConfig, grpo_step,
                                               make_engine_rollout)

    enc_cfg = WhisperEncoderConfig(use_flash=True)
    lm_cfg = dataclasses.replace(Qwen2Config.qwen25_1_5b(), use_flash=True,
                                 remat="full")
    cfg = AF3Config(encoder=enc_cfg, lm=lm_cfg)
    log("bench_grpo: init 1.5B bf16 policy + frozen reference...")
    bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)  # noqa: E731
    policy = {
        "encoder": bf16(whisper_encoder.init(jax.random.PRNGKey(0), enc_cfg)),
        "adaptor": bf16(adaptor_mod.init(jax.random.PRNGKey(1), enc_cfg.d_model,
                                         lm_cfg.hidden_size)),
        "lm": jax.jit(lambda: bf16(qwen2.init(jax.random.PRNGKey(2), lm_cfg)))(),
    }
    # frozen reference: share the (frozen) towers with the policy and hold the
    # reference LM in int8 — a full bf16 copy next to policy + grads + engine
    # pool runtime-OOMs one chip; an int8 frozen reference is the standard
    # deployment choice and _token_logp dispatches on the weight layout
    from audio_flamingo_tpu.ops.quant import quantize_lm_params

    ref = {"encoder": policy["encoder"], "adaptor": policy["adaptor"],
           "lm": jax.jit(quantize_lm_params)(policy["lm"])}
    _ = float(policy["lm"]["ln_f_w"].astype(jnp.float32).sum())

    rng = np.random.default_rng(0)
    text = 64
    ntok = 750
    ids = np.full((1, ntok + text), cfg.audio_token_id, np.int32)
    ids[0, ntok:] = rng.integers(0, 150_000, text)
    mels = (rng.normal(size=(1, 1, 3000, 128)) * 0.1).astype(np.float32)
    prompt = {"ids": ids, "mels": mels}
    gcfg = GRPOConfig(group_size=8, max_new_tokens=128, temperature=1.0,
                      top_k=50)

    engine = PagedEngine(params=policy, cfg=cfg, num_rows=8, num_blocks=80,
                         block_size=128, max_blocks_per_seq=8, chunk=16,
                         eos_token_id=-1, compute_dtype=jnp.bfloat16,
                         sampling=SamplingParams(greedy=False),
                         prefix_cache=True)
    roll = make_engine_rollout(engine)
    log("bench_grpo: compile rollout path (paged engine, G=8)...")
    _ = roll(prompt["ids"], prompt["mels"], gcfg, -1)   # warm every bucket
    t0 = time.perf_counter()
    full, gen_mask, lengths = roll(prompt["ids"], prompt["mels"], gcfg, -1)
    dt_roll = time.perf_counter() - t0
    gen_tok = int(np.asarray(lengths).sum())
    rollout_tps = gen_tok / dt_roll
    log(f"bench_grpo: rollout {gen_tok} tok / {dt_roll:.2f} s = "
        f"{rollout_tps:.1f} tok/s (G=8 x 128, paged engine)")

    opt = optax.adafactor(1e-6)
    opt_state = opt.init(policy["lm"])   # mf_3_grpo: LM-only training

    def reward_fn(text_out: str) -> float:
        return len(set(text_out.split())) / max(len(text_out.split()), 1)

    def decode_fn(toks) -> str:
        return " ".join(str(t) for t in toks)

    # the update runs at the rollout's G=8: rollout and update are strictly
    # sequential, so grpo_step(offload_pool=True) swaps the engine's page pool
    # to host RAM for the update phase (grads + chunked policy/ref logp over
    # [8, ~880] do not fit NEXT TO serving pages on one 16 GB chip — VERDICT
    # r4 #5) and restores it after; grads+params are donated into the apply
    gcfg_step = dataclasses.replace(gcfg, group_size=8, max_new_tokens=64)

    def one_step(policy, opt_state, k):
        # grpo_step re-syncs engine.params to the updated policy internally
        return grpo_step(
            policy, ref, opt, opt_state, cfg, [prompt], reward_fn, gcfg_step,
            eos_token_id=-1, rng=k, decode_fn=decode_fn,
            compute_dtype=jnp.bfloat16, rollout_fn=roll, trainable="lm",
            offload_pool=True)

    out = {"grpo_rollout_tps": round(rollout_tps, 1)}
    try:
        log("bench_grpo: compile update path (policy+ref logp, PPO-clip bwd)...")
        policy, opt_state, m = one_step(policy, opt_state, jax.random.PRNGKey(1))
        t0 = time.perf_counter()
        policy, opt_state, m = one_step(policy, opt_state, jax.random.PRNGKey(2))
        dt_step = time.perf_counter() - t0
        log(f"bench_grpo: full GRPO iteration {dt_step*1e3:.0f} ms "
            f"(loss {m['loss']:.3f}, mean reward {m['mean_reward']:.3f})")
        out["grpo_step_ms"] = round(dt_step * 1e3, 1)
        out["grpo_mean_reward"] = round(m["mean_reward"], 3)
    except Exception as e:  # noqa: BLE001 — keep the measured rollout number
        log(f"bench_grpo: update phase failed ({type(e).__name__}) — "
            "rollout throughput stands; see STATUS.md GRPO row")
        e.__traceback__ = None
        out["grpo_step_ms"] = None
    return out


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
        # is_prefill certifies the fresh cache so the flash fast path applies —
        # without it the post-round-1 safe default is dense attention, whose
        # [1, nkv, G, 15k, 16k] f32 scores tensor cannot fit HBM
        h, cache = qwen2.forward(lm_p, lm_cfg, embeds, pos, cache=cache,
                                 is_prefill=True)
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
    log(f"bench_ttft: {dt*1e3:.0f} ms to first token (10-min clip, serial)")
    out = {"ttft_10min_s": dt}

    # fused single-dispatch pipeline: mel -> encode -> prefill in ONE program (XLA
    # schedules across phase boundaries; saves the chained-dispatch syncs). Token-
    # exact vs the serial path by construction (same math, same order).
    @jax.jit
    def fused_fn(enc_p, ada_p, lm_p, wav, ids):
        m = fe._window_mels(wav).astype(jnp.bfloat16)
        h = whisper_encoder.apply(enc_p, enc_cfg, m, compute_dtype=jnp.bfloat16)
        e = adaptor_mod.apply(ada_p, h)
        embeds = qwen2.embed(lm_p, ids, dtype=jnp.bfloat16)
        flat = e.reshape(1, -1, lm_cfg.hidden_size)
        embeds = af3.scatter_audio_embeds(embeds, ids, flat, audio_id)
        pos = jnp.arange(prompt_len)[None]
        cache = qwen2.init_cache(lm_cfg, 1, cap, dtype=jnp.bfloat16)
        h2, cache = qwen2.forward(lm_p, lm_cfg, embeds, pos, cache=cache,
                                  is_prefill=True)
        return jnp.argmax(qwen2.unembed(lm_p, lm_cfg, h2[:, -1]), -1).astype(jnp.int32)

    try:
        log("bench_ttft: compile fused single-dispatch...")
        tok_serial = ttft()
        tok_fused = int(fused_fn(enc_p, ada_p, lm_p, wav, ids_j)[0])
        assert tok_fused == tok_serial, (tok_fused, tok_serial)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(fused_fn(enc_p, ada_p, lm_p, wav, ids_j)[0])
            times.append(time.perf_counter() - t0)
        out["ttft_10min_fused_s"] = float(np.median(times))
        log(f"bench_ttft: fused {out['ttft_10min_fused_s']*1e3:.0f} ms "
            "(token-exact vs serial)")
    except Exception as e:  # noqa: BLE001
        log(f"bench_ttft: fused variant failed: {type(e).__name__}: {e}")

    # w8a8 prefill (cfg.a8_prefill): int8 activations hit the MXU's 2x int8 rate —
    # the single-chip TTFT is FLOP-bound in the 15k-token prefill (~1.2 s at 100%
    # bf16 MFU), so overlap alone cannot reach 1.4 s; halving matmul time can.
    # Accuracy is a tolerance band (tests/test_quant.py), reported separately.
    lm_cfg_a8 = dataclasses.replace(lm_cfg, a8_prefill=True)

    @jax.jit
    def prefill_a8(lm_p, audio_embeds, ids):
        embeds = qwen2.embed(lm_p, ids, dtype=jnp.bfloat16)
        flat = audio_embeds.reshape(1, -1, lm_cfg.hidden_size)
        embeds = af3.scatter_audio_embeds(embeds, ids, flat, audio_id)
        pos = jnp.arange(prompt_len)[None]
        cache = qwen2.init_cache(lm_cfg_a8, 1, cap, dtype=jnp.bfloat16)
        h, cache = qwen2.forward(lm_p, lm_cfg_a8, embeds, pos, cache=cache,
                                 is_prefill=True)
        return jnp.argmax(qwen2.unembed(lm_p, lm_cfg_a8, h[:, -1]), -1).astype(jnp.int32)

    try:
        log("bench_ttft: compile a8 prefill...")

        def ttft_a8():
            m = fe._window_mels(wav).astype(jnp.bfloat16)
            e = enc_fn(enc_p, ada_p, m)
            return int(prefill_a8(lm_p, e, ids_j)[0])

        _ = ttft_a8()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = ttft_a8()
            times.append(time.perf_counter() - t0)
        out["ttft_10min_a8_s"] = float(np.median(times))
        log(f"bench_ttft: a8 prefill {out['ttft_10min_a8_s']*1e3:.0f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"bench_ttft: a8 variant failed: {type(e).__name__}: {e}")

    # a8 encoder + a8 prefill, FUSED into one dispatch: the profile
    # (scripts/profile_ttft.py) shows the a8 prefill's matmuls already at ~91%
    # of the int8 peak, so the remaining levers are the bf16 encoder's 470 ms
    # (int8 halves its matmul floor) and the chained-dispatch tunnel syncs
    # (~40 ms each; one program = one sync).
    try:
        from audio_flamingo_tpu.ops.quant import quantize_encoder_params

        log("bench_ttft: quantize encoder + compile fused a8 pipeline...")
        enc_p8 = jax.jit(quantize_encoder_params)(enc_p)
        jax.block_until_ready(enc_p8["layers"]["q"]["w_q"])

        @jax.jit
        def fused_a8_fn(enc_p8, ada_p, lm_p, wav, ids):
            m = fe._window_mels(wav).astype(jnp.bfloat16)
            h = whisper_encoder.apply(enc_p8, enc_cfg, m, compute_dtype=jnp.bfloat16)
            e = adaptor_mod.apply(ada_p, h)
            embeds = qwen2.embed(lm_p, ids, dtype=jnp.bfloat16)
            flat = e.reshape(1, -1, lm_cfg.hidden_size)
            embeds = af3.scatter_audio_embeds(embeds, ids, flat, audio_id)
            pos = jnp.arange(prompt_len)[None]
            cache = qwen2.init_cache(lm_cfg_a8, 1, cap, dtype=jnp.bfloat16)
            h2, cache = qwen2.forward(lm_p, lm_cfg_a8, embeds, pos, cache=cache,
                                      is_prefill=True)
            return jnp.argmax(qwen2.unembed(lm_p, lm_cfg_a8, h2[:, -1]),
                              -1).astype(jnp.int32)

        _ = int(fused_a8_fn(enc_p8, ada_p, lm_p, wav, ids_j)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(fused_a8_fn(enc_p8, ada_p, lm_p, wav, ids_j)[0])
            times.append(time.perf_counter() - t0)
        out["ttft_10min_a8e_s"] = float(np.median(times))
        log(f"bench_ttft: a8 encoder + a8 prefill fused "
            f"{out['ttft_10min_a8e_s']*1e3:.0f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"bench_ttft: a8-encoder variant failed: {type(e).__name__}: {e}")

    # fused quant-epilogue encoder kernels (ops/pallas/enc_fused.py, VERDICT r3
    # #1): the measured-winning stage mix (cfg.fused_stages) replaces the
    # XLA-composed w8a8 stages — the MLP keeps its GELU+requant in VMEM.
    try:
        from audio_flamingo_tpu.ops.quant import quantize_encoder_params_fused

        log("bench_ttft: fused-kernel encoder (enc_fused) + a8 prefill...")
        enc_pf = jax.jit(lambda p: quantize_encoder_params_fused(
            p, enc_cfg.head_dim))(enc_p)
        jax.block_until_ready(enc_pf["layers"]["qkv"]["w_q"])

        @jax.jit
        def fused_a8f_fn(enc_pf, ada_p, lm_p, wav, ids):
            m = fe._window_mels(wav).astype(jnp.bfloat16)
            h = whisper_encoder.apply(enc_pf, enc_cfg, m,
                                      compute_dtype=jnp.bfloat16)
            e = adaptor_mod.apply(ada_p, h)
            embeds = qwen2.embed(lm_p, ids, dtype=jnp.bfloat16)
            flat = e.reshape(1, -1, lm_cfg.hidden_size)
            embeds = af3.scatter_audio_embeds(embeds, ids, flat, audio_id)
            pos = jnp.arange(prompt_len)[None]
            cache = qwen2.init_cache(lm_cfg_a8, 1, cap, dtype=jnp.bfloat16)
            h2, cache = qwen2.forward(lm_p, lm_cfg_a8, embeds, pos, cache=cache,
                                      is_prefill=True)
            return jnp.argmax(qwen2.unembed(lm_p, lm_cfg_a8, h2[:, -1]),
                              -1).astype(jnp.int32)

        _ = int(fused_a8f_fn(enc_pf, ada_p, lm_p, wav, ids_j)[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(fused_a8f_fn(enc_pf, ada_p, lm_p, wav, ids_j)[0])
            times.append(time.perf_counter() - t0)
        out["ttft_10min_a8f_s"] = float(np.median(times))
        log(f"bench_ttft: fused-kernel encoder + a8 prefill "
            f"{out['ttft_10min_a8f_s']*1e3:.0f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"bench_ttft: fused-kernel encoder variant failed: "
            f"{type(e).__name__}: {e}")
    return out


def bench_spec_real() -> dict:
    """Speculation with a REAL (distilled) draft — true accept-compare path,
    guardrail ACTIVE (no Bernoulli injection). VERDICT r4 #6."""
    from scripts.distill_draft import ensure_draft_asset, run_real_spec_bench

    path = ensure_draft_asset()
    if path is None:
        log("bench_spec_real: no draft asset and distillation unavailable")
        return {}
    return run_real_spec_bench(path, log)


def _safe(fn, fallback: dict) -> dict:
    """A failed secondary section must not cost the whole BENCH artifact."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        log(f"{fn.__name__} FAILED: {type(e).__name__}: {e}")
        # drop the traceback's frame references NOW: they pin the failed
        # section's device trees (GBs of HBM) and poison every later section
        # with RESOURCE_EXHAUSTED (measured: a failed 7B section made a 1.5B
        # section's INIT fail)
        import gc

        e.__traceback__ = None
        del e
        gc.collect()
        return fallback


# (name, fn, fallback). Ordered headline-first, then the current round's gated
# sections, then the stable re-measures: with cumulative emission + the internal
# wall-clock budget, whatever completes before the driver's (or our own) budget
# expires IS the artifact — round 4 lost its whole scoreboard to an all-at-the-
# end print (BENCH_r04.json rc:124, parsed:null).
def _sections():
    return [
        ("encoder", bench_encoder,
         {"encode_rtfx_10min": 0.0, "encode_s_10min": 0.0}),
        ("decode", bench_decode,
         {"decode_tps_7b_int8_b1": 0.0, "decode_ms_per_tok": 0.0,
          "decode_capacity": 0}),
        ("ttft", bench_ttft, {"ttft_10min_s": 0.0}),
        ("clap", bench_clap, {}),
        ("xattn_engines", bench_xattn_engines, {}),
        ("grpo", bench_grpo, {}),
        ("spec_real", bench_spec_real, {}),
        ("decode_matrix", bench_decode_matrix, {}),
        ("decode_w4", bench_decode_w4, {}),
        ("engines_mixed", bench_engines_mixed, {}),
        ("spec_engine", bench_spec_engine, {}),
        ("spec_paged", bench_spec_paged, {}),
        ("prefix_cache", bench_prefix_cache, {}),
        ("paged_matrix", bench_paged_matrix, {}),
        ("longtail", bench_longtail, {}),
        ("train", bench_train, {}),
        ("train_mm", bench_train_mm, {}),
    ]


def _build_line(results: dict, done: list, skipped: list,
                elapsed_s: float) -> dict:
    """Assemble the cumulative scoreboard line from completed sections."""
    enc = results.get("encoder", {})
    dec = results.get("decode", {})
    ttft = results.get("ttft", {})
    rtfx = float(enc.get("encode_rtfx_10min", 0.0))
    secondary = {
        "decode_tps_af3_7b_int8_b1_1chip":
            round(float(dec.get("decode_tps_7b_int8_b1", 0.0)), 2),
        "decode_ms_per_tok": round(float(dec.get("decode_ms_per_tok", 0.0)), 3),
        "decode_vs_target_30tps":
            round(float(dec.get("decode_tps_7b_int8_b1", 0.0)) / 30.0, 2),
        "encode_s_10min": round(float(enc.get("encode_s_10min", 0.0)), 4),
    }
    for key in ("ttft_10min_s", "ttft_10min_fused_s", "ttft_10min_a8_s",
                "ttft_10min_a8e_s", "ttft_10min_a8f_s"):
        if key in ttft:
            secondary[f"p50_{key}"] = round(float(ttft[key]), 3)
    if "decode_matrix" in results:
        secondary["decode_matrix_int8kv_tps"] = results["decode_matrix"]
    for name, _, _ in _sections():
        if name in ("encoder", "decode", "ttft", "decode_matrix"):
            continue
        secondary.update(results.get(name, {}))
    secondary["sections_done"] = done
    if skipped:
        secondary["skipped_budget"] = skipped
    secondary["bench_elapsed_s"] = round(elapsed_s, 1)
    return {
        "metric": "encode_rtfx_10min",
        "value": round(rtfx, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(rtfx / 100.0, 3),  # target: >=100x realtime
        "secondary": secondary,
    }


def main():
    _start_watchdog()
    # Internal wall-clock budget: stop LAUNCHING sections once exceeded and
    # emit what we have — being timeout-killed mid-compile both loses the
    # scoreboard and wedges the remote compile service (CLAUDE.md rule 2).
    budget_s = float(os.environ.get("BENCH_BUDGET_MIN", "25")) * 60.0
    t_start = time.time()
    results: dict = {}
    done: list = []
    sections = _sections()
    for i, (name, fn, fallback) in enumerate(sections):
        elapsed = time.time() - t_start
        if elapsed > budget_s:
            skipped = [n for n, _, _ in sections[i:]]
            log(f"bench: {elapsed/60:.1f} min elapsed > {budget_s/60:.0f} min "
                f"budget — skipping {skipped}")
            print(json.dumps(_build_line(results, done, skipped,
                                         time.time() - t_start)), flush=True)
            return
        results[name] = _safe(fn, fallback)
        done.append(name)
        # cumulative scoreboard after EVERY section: the driver's parser takes
        # the last parseable stdout line, so a partial scoreboard survives any
        # external kill.
        print(json.dumps(_build_line(results, done, [],
                                     time.time() - t_start)), flush=True)


def _main_only(names: list[str]) -> None:
    """Run just the named section(s) (e.g. `python bench.py --only spec_paged
    train`) and print their merged dict as the JSON line. For targeted
    re-measures that should not pay the full ~15-min suite."""
    _start_watchdog()
    out: dict = {}
    for name in names:
        fn = globals().get(f"bench_{name}")
        if fn is None:
            log(f"no such section: bench_{name}")
            continue
        out.update(_safe(fn, {}))
    print(json.dumps({"metric": f"only:{','.join(names)}", "value": 0,
                      "unit": "section", "vs_baseline": 0, "secondary": out}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--only":
        if len(sys.argv) == 2:
            # falling through to the full ~15-min suite on a typo would burn
            # shared TPU time: treat a bare --only as a usage error instead
            sections = sorted(n[len("bench_"):] for n in globals()
                              if n.startswith("bench_"))
            print("usage: python bench.py --only <section...>\n"
                  "available sections: " + " ".join(sections), file=sys.stderr)
            sys.exit(2)
        _main_only(sys.argv[2:])
    else:
        main()
