"""Component-level profile of the batched speculative round (VERDICT r2 Next #1).

BENCH_r02 measured the spec engine at 94.8 tok/s (a=0) vs 219.5 plain — and noted the
~84 ms/round implied by engine throughput is 2-3x the component sum. This script times
each component of `decode_spec_chunk` separately on the chip, all device-resident with
chained dispatches (CLAUDE.md rule 6), to find where the round actually goes:

  1. plain decode_chunk step (b8, target 7B int8)        — the baseline to beat
  2. draft-only step (b8, 0.5B bf16, _rows_forward)       — x k per round
  3. verify-only (one (k+1)-token _rows_forward, 7B int8) — x 1 per round
  4. full spec round (k draft + verify + accept/rollback) — the integrated number
  5. spec round at rounds={1..8} per dispatch             — sync amortization curve

Run on the attached chip: `python scripts/profile_spec.py` (~5 min of compiles).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import numpy as np

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops.quant import random_quantized_lm
from audio_flamingo_tpu.runtime.engine import (SlotCache, _rows_forward,
                                               decode_spec_chunk, init_slot_cache)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, n=3):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    b, cap, k = 8, 1024, 4
    lm_cfg = Qwen2Config.qwen25_7b()
    draft_cfg = Qwen2Config.qwen25_0_5b()
    cfg = AF3Config(lm=lm_cfg)
    log("init 7B int8 + 0.5B bf16...")
    lm_p = jax.jit(lambda: random_quantized_lm(jax.random.PRNGKey(0), lm_cfg))()
    draft_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           qwen2.init(jax.random.PRNGKey(1), draft_cfg))
    _ = float(lm_p["ln_f_w"].astype(jnp.float32).sum())
    params = {"lm": lm_p}

    cache = init_slot_cache(lm_cfg, b, cap, jnp.bfloat16)
    cache = SlotCache(cache.k, cache.v, jnp.full((b,), 500, jnp.int32))
    d_cache = init_slot_cache(draft_cfg, b, cap, jnp.bfloat16)
    tok = jnp.ones((b,), jnp.int32)

    # 1) plain target decode step, N chained
    n = 16

    @jax.jit
    def plain_n(params, cache, tok):
        def body(i, c):
            cache, tok = c
            x = qwen2.embed(params["lm"], tok[:, None], dtype=jnp.bfloat16)
            h, cache = _rows_forward(params["lm"], lm_cfg, x, cache.lengths, cache)
            nxt = jnp.argmax(qwen2.unembed(params["lm"], lm_cfg, h[:, 0]),
                             -1).astype(jnp.int32)
            return SlotCache(cache.k, cache.v, cache.lengths + 1), nxt
        return jax.lax.fori_loop(0, n, body, (cache, tok))

    def run_plain():
        c2, t2 = plain_n(params, cache, tok)
        _ = int(t2[0])
    dt = timeit(run_plain) / n
    log(f"plain target step (b{b}): {dt*1e3:.2f} ms -> {b/dt:.0f} tok/s decode-only")
    target_step = dt

    # 2) draft-only step, N chained
    @jax.jit
    def draft_n(draft_p, d_cache, tok):
        def body(i, c):
            d_cache, tok = c
            x = qwen2.embed(draft_p, tok[:, None], dtype=jnp.bfloat16)
            h, d_cache = _rows_forward(draft_p, draft_cfg, x, d_cache.lengths, d_cache)
            nxt = jnp.argmax(qwen2.unembed(draft_p, draft_cfg, h[:, 0]),
                             -1).astype(jnp.int32)
            return SlotCache(d_cache.k, d_cache.v, d_cache.lengths + 1), nxt
        return jax.lax.fori_loop(0, n, body, (d_cache, tok))

    def run_draft():
        c2, t2 = draft_n(draft_p, d_cache, tok)
        _ = int(t2[0])
    dt = timeit(run_draft) / n
    log(f"draft step (b{b}, 0.5B): {dt*1e3:.2f} ms")
    draft_step = dt

    # 3) verify-only: (k+1)-token block forward on the target, N chained
    @jax.jit
    def verify_n(params, cache, seq):
        def body(i, c):
            cache, seq = c
            x = qwen2.embed(params["lm"], seq, dtype=jnp.bfloat16)
            h, cache = _rows_forward(params["lm"], lm_cfg, x, cache.lengths, cache)
            greedy = jnp.argmax(qwen2.unembed(params["lm"], lm_cfg, h),
                                -1).astype(jnp.int32)
            return SlotCache(cache.k, cache.v, cache.lengths), greedy
        return jax.lax.fori_loop(0, n, body, (cache, seq))

    seq = jnp.ones((b, k + 1), jnp.int32)

    def run_verify():
        c2, g = verify_n(params, cache, seq)
        _ = int(g[0, 0])
    dt = timeit(run_verify) / n
    log(f"verify block k+1={k+1} (b{b}): {dt*1e3:.2f} ms")
    verify_step = dt

    ideal = k * draft_step + verify_step
    log(f"component sum: {ideal*1e3:.2f} ms/round "
        f"(k*draft {k*draft_step*1e3:.1f} + verify {verify_step*1e3:.1f})")

    # 4/5) full spec round at various rounds-per-dispatch. decode_spec_chunk
    # DONATES its cache args; re-donating the same buffers across timing calls
    # both invalidates them and doubles HBM (the r3 profile crash) — so the
    # integrated section threads ONE set of donated buffers through the calls.
    state = {"c": SlotCache(jnp.array(cache.k), jnp.array(cache.v), cache.lengths),
             "dk": jnp.array(d_cache.k), "dv": jnp.array(d_cache.v)}
    for rounds in (1, 2, 4, 8):
        def run_spec(rounds=rounds):
            c, dk, dv, t2, dn, out, valid = decode_spec_chunk(
                params, draft_p, cfg, draft_cfg,
                SlotCache(state["c"].k, state["c"].v, cache.lengths),
                state["dk"], state["dv"], tok, jnp.zeros((b,), bool),
                k=k, rounds=rounds, eos_token_id=-1)
            state["c"], state["dk"], state["dv"] = SlotCache(c.k, c.v, cache.lengths), dk, dv
            _ = int(t2[0])
        dt = timeit(run_spec)
        log(f"spec rounds={rounds}: {dt*1e3:.1f} ms total -> "
            f"{dt/rounds*1e3:.2f} ms/round (sum ideal {ideal*1e3:.2f}, "
            f"overhead {(dt/rounds-ideal)*1e3:+.2f} ms)")


if __name__ == "__main__":
    main()
