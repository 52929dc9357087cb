"""Where does the paged xattn engine lose vs the slot engine? (VERDICT r4 #4:
xattn_paged_vs_slot target >= 1.0; measured 0.905 -> 0.958 after the
stacked-pool fix.) Per-request TTFT vs decode-tok/s splits prefill-side from
decode-side losses. Run on TPU: python scripts/profile_xattn_paged.py"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, Qwen2Config
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.ops.quant import random_quantized_lm
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.flamingo_engine import (FlamingoEngine,
                                                            FlamingoRequest)
    from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

    lm_cfg = Qwen2Config.qwen25_3b()
    cfg = AF2Config(clap=ClapAudioConfig(), lm=lm_cfg)
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

    def run(name, engine_fn):
        warm = engine_fn()
        for r in workload()[:2]:
            warm.submit(r)
        warm.run_until_done()
        eng = engine_fn()
        for r in workload():
            eng.submit(r)
        t0 = time.perf_counter()
        eng.run_until_done()
        dt = time.perf_counter() - t0
        print(f"{name}: total {dt:.2f} s")
        ttfts, dtps = {}, {}
        for rid, m in sorted(eng.request_metrics.items()):
            print(f"  {rid}: ttft {m['ttft_s']*1e3:7.1f} ms, "
                  f"decode {m['decode_tps']:6.1f} tok/s, total {m['total_s']:.2f} s")
            ttfts[rid] = m["ttft_s"]
            dtps[rid] = m["decode_tps"]
        return ttfts, dtps

    st, sd = run("slot ", lambda: FlamingoEngine(
        params=params, cfg=cfg, num_slots=4, capacity=2048, chunk=16,
        eos_token_id=151_645, sampling=SamplingParams(greedy=True),
        compute_dtype=jnp.bfloat16, n_media=1, windows_per_media=wpm))
    pt, pd = run("paged", lambda: PagedFlamingoEngine(
        params=params, cfg=cfg, num_rows=4, num_blocks=56, block_size=128,
        max_blocks_per_seq=16, chunk=16, eos_token_id=151_645,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.bfloat16,
        n_media=1, windows_per_media=wpm))
    for rid in sorted(st):
        print(f"{rid}: ttft paged/slot {pt[rid]/st[rid]:.2f}, "
              f"decode paged/slot {pd[rid]/sd[rid]:.2f}")


if __name__ == "__main__":
    main()
