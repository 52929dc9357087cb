"""Sweep speculation depth (spec_k x spec_rounds) on the REAL-draft workload.

The round-5 draft-cache fix (engine.spec_chunk_rounds 1b) makes long accept
chains hold across rounds, so the pre-fix sweet spot (k=4, rounds=6) may be
leaving tok/s on the table: with per-token acceptance ~0.94 a deeper k spends
more draft steps per verify and fewer ~40 ms host syncs per emitted token.

Measured on chip (best of 2 reps per config, 8 x 500-prompt / 256-new),
with the ORIGINAL k=4-DAgger draft asset:

    k4_r6  845 tok/s  acceptance 0.945   (pre-sweep default)
    k4_r8  902 tok/s  acceptance 0.911
    k6_r6  980 tok/s  acceptance 0.869
    k6_r8  941-1077   acceptance 0.912   <- round-5 mid-round ship
    k8_*   335-345    acceptance 0.2-0.3 <- COLLAPSE: the DAgger draft was
           trained on k=4 engine streams; 8-deep autoregression leaves its
           training distribution.

Re-swept after distill_draft.deepen() (DAgger on k=6/r=8 + k=8/r=8 engine
streams — the prescribed "retrain deeper before sweeping deeper"):

    k6_r8  1062 tok/s  acceptance 0.912
    k8_r8  1152        acceptance 0.887
    k8_r10 1246        acceptance 0.946   (k=8 collapse GONE)
    k8_r12 1146        acceptance 0.789
    k8_r16 1219        acceptance 0.887
    k10_r8 1315        acceptance 0.967   <- shipped (run_real_spec_bench):
           the k=8-trained draft generalizes PAST its training depth once
           DAgger closes the covariate shift.
    k10_r10 1276       acceptance 0.775   }
    k12_r8   999       acceptance 0.820   } past the peak: deeper k or more
    k12_r10 1254       acceptance 0.926   } rounds lose acceptance to drift

Run on TPU: python scripts/sweep_spec_k.py
"""

import gc
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def main():
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
    from scripts.distill_draft import (GEN_LEN, PROMPT_LEN, WORKLOAD_SEED,
                                       ensure_draft_asset, load_draft,
                                       _make_target)

    path = ensure_draft_asset()
    assert path, "no draft asset — run scripts/distill_draft.py first"
    draft_p, dcfg = load_draft(path)
    params, cfg = _make_target()
    rng = np.random.default_rng(WORKLOAD_SEED)
    prompts = [rng.integers(0, 150_000, (1, PROMPT_LEN)).astype(np.int32)
               for _ in range(8)]

    def run(spec_k, spec_rounds):
        def make():
            return BatchEngine(params=params, cfg=cfg, num_slots=8,
                               capacity=1024, chunk=16, eos_token_id=-1,
                               sampling=SamplingParams(greedy=True),
                               draft_params=draft_p, draft_cfg=dcfg,
                               spec_k=spec_k, spec_rounds=spec_rounds)
        # warm at the FULL workload shape: a 64-token warm prompt compiles
        # the wrong prefill bucket and the measured run pays the compile
        # (first sweep measured 70 tok/s where the warm run does 700)
        warm = make()
        warm.submit(Request(request_id="w", ids=prompts[0],
                            max_new_tokens=GEN_LEN))
        warm.run_until_done()
        del warm
        gc.collect()
        eng = make()
        for i, p in enumerate(prompts):
            eng.submit(Request(request_id=f"r{i}", ids=p,
                               max_new_tokens=GEN_LEN))
        t0 = time.perf_counter()
        out = eng.run_until_done()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in out.values())
        acc = float(eng.spec_stats.get("acceptance_est", 0.0))
        del eng
        gc.collect()
        return total / dt, acc

    configs = [(4, 6), (4, 8), (6, 6), (6, 8), (8, 6)]
    if len(sys.argv) > 1:  # e.g. `sweep_spec_k.py 6,8 8,8 8,10`
        configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    results = {}
    for k, rounds in configs:
        tps, acc = run(k, rounds)
        results[f"k{k}_r{rounds}"] = {"tps": round(tps, 1),
                                      "accept": round(acc, 3)}
        print(f"spec_k={k} rounds={rounds}: {tps:.1f} tok/s, "
              f"acceptance {acc:.3f}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    import jax  # noqa: F401

    main()
