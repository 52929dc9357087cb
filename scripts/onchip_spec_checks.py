"""On-chip spot checks for the round-3 late additions (run when the axon relay
is healthy; CPU-handle equivalents already gate correctness in tests/).

Covers, at serving scale on the real chip:
1. paged speculative decoding (int8 pool, shallow int8 draft) — mechanics +
   measured tok/s at injected acceptance 1.0;
2. sampled (Leviathan) speculation on the slot engine — runs + deterministic;
3. fused-w4 target under speculation — one chunk executes through the
   stacked-kernel verify path.

ONE TPU process at a time; obeys the no-timeout-kill rule (run in background
and wait). Prints one line per check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config
from audio_flamingo_tpu.ops.quant import random_quantized_lm
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine


def main():
    print("devices:", jax.devices())
    lm_cfg = Qwen2Config.qwen25_7b()
    cfg = AF3Config(lm=lm_cfg)
    shallow_cfg = Qwen2Config(vocab_size=151_936, hidden_size=1280,
                              intermediate_size=6912, num_layers=4,
                              num_heads=10, num_kv_heads=2,
                              tie_word_embeddings=True)
    print("init 7B int8 target + 4L int8 draft...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    draft_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(2),
                                                  shallow_cfg))()
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}
    rng = np.random.default_rng(0)

    # 1) paged spec, int8 pool, a=1.0 injected
    eng = PagedEngine(params=params, cfg=cfg, num_rows=8, num_blocks=80,
                      block_size=128, max_blocks_per_seq=8, chunk=16,
                      eos_token_id=151_645, kv_dtype=jnp.int8, preempt=False,
                      sampling=SamplingParams(greedy=True),
                      draft_params=draft_p, draft_cfg=shallow_cfg,
                      spec_k=4, spec_rounds=6, spec_accept_sim=1.0)
    for i in range(8):
        eng.submit(Request(request_id=f"r{i}",
                           ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                           max_new_tokens=48))
    t0 = time.perf_counter()
    res = eng.run_until_done()
    dt = time.perf_counter() - t0
    tot = sum(len(v) for v in res.values())
    print(f"1) paged spec int8 a=1.0: {tot} tokens in {dt:.2f}s "
          f"({tot/dt:.1f} tok/s incl. prefill)")

    # 2) sampled spec on the slot engine (twice, same seed -> identical)
    def run_sampled():
        e = BatchEngine(params=params, cfg=cfg, num_slots=4, capacity=1024,
                        chunk=16, eos_token_id=151_645, seed=3,
                        sampling=SamplingParams(greedy=False, temperature=0.8,
                                                top_k=40),
                        draft_params=draft_p, draft_cfg=shallow_cfg,
                        spec_k=4, spec_rounds=4)
        assert e._spec_sampled()
        for i in range(4):
            e.submit(Request(request_id=f"s{i}",
                             ids=rng2.integers(0, 150_000, (1, 300))
                             .astype(np.int32), max_new_tokens=32))
        return e.run_until_done()

    rng2 = np.random.default_rng(1)
    a = run_sampled()
    rng2 = np.random.default_rng(1)
    b = run_sampled()
    assert a == b, "sampled spec nondeterministic per seed on chip"
    print(f"2) sampled spec slot engine: deterministic, "
          f"{sum(len(v) for v in a.values())} tokens")

    # 3) fused-w4 target under speculation: one small engine run executes.
    # Free the int8 target + check-1 pool first — int8 7B (~8 GB) + w4 7B
    # (~4 GB) + two engine pools exceed the chip's 16 GB HBM together.
    import gc

    del eng, lm_p, params, a, b
    gc.collect()

    from audio_flamingo_tpu.ops.quant4 import random_quantized_lm_w4

    w4_p = {"lm": jax.jit(lambda: random_quantized_lm_w4(
        jax.random.PRNGKey(4), lm_cfg))()}
    _ = float(w4_p["lm"]["ln_f_w"].astype(jnp.float32).sum())
    e = PagedEngine(params=w4_p, cfg=cfg, num_rows=4, num_blocks=40,
                    block_size=128, max_blocks_per_seq=8, chunk=16,
                    eos_token_id=151_645, kv_dtype=jnp.int8, preempt=False,
                    sampling=SamplingParams(greedy=True),
                    draft_params=draft_p, draft_cfg=shallow_cfg,
                    spec_k=4, spec_rounds=4, spec_accept_sim=0.8)
    for i in range(4):
        e.submit(Request(request_id=f"w{i}",
                         ids=rng.integers(0, 150_000, (1, 500)).astype(np.int32),
                         max_new_tokens=32))
    t0 = time.perf_counter()
    res = e.run_until_done()
    dt = time.perf_counter() - t0
    tot = sum(len(v) for v in res.values())
    print(f"3) w4 target under spec (a=0.8 injected): {tot} tokens in {dt:.2f}s "
          f"({tot/dt:.1f} tok/s incl. prefill)")
    print("ONCHIP SPEC CHECKS OK")


if __name__ == "__main__":
    main()
