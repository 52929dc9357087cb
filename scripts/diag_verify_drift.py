"""Quantify the verify-forward vs plain-decode argmax drift (the spec_real
token_match story): run the spec engine with the TARGET AS ITS OWN DRAFT and
the REAL accept-compare. In exact arithmetic acceptance would be 1.0 by
construction; on bf16 random weights every accept compares the target's
single-token (draft path) argmax against its multi-token (verify) argmax for
the same prefix, so `1 - acceptance` IS the per-token near-tie flip rate —
independent evidence that spec_real's token_match < 1 is numerics, not an
accept-rule bug (the greedy rule is exact on CPU: tests/test_*speculative*).

History: this probe reading 0.36 (instead of ~1) exposed the missing
last-proposal draft-KV write in spec_chunk_rounds (fixed; see engine.py 1b);
post-fix it reads ~0.909 on the bf16 random 7B on chip, leaving only the
genuine near-tie flip rate.

Run on TPU: python scripts/diag_verify_drift.py"""

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
    from scripts.distill_draft import _make_target

    params, cfg = _make_target()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 150_000, (1, 500)).astype(np.int32)
               for _ in range(8)]

    eng = BatchEngine(params=params, cfg=cfg, num_slots=8, capacity=1024,
                      chunk=16, eos_token_id=-1,
                      sampling=SamplingParams(greedy=True),
                      draft_params=params["lm"], draft_cfg=cfg.lm,
                      spec_k=4, spec_rounds=4, spec_guard=False)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=64))
    t0 = time.perf_counter()
    eng.run_until_done()
    acc = eng.spec_stats.get("acceptance_est", 0.0)
    print(f"target-as-draft REAL compare: acceptance {acc:.4f} "
          f"(exact-arithmetic value is 1.0; 1-acc = per-token bf16 near-tie "
          f"argmax flip rate between the multi-token verify forward and the "
          f"single-token decode forward) [{time.perf_counter()-t0:.0f} s]")


if __name__ == "__main__":
    main()
