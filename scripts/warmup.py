"""Serving warm-up: precompile every (window-bucket x token-bucket) executable so the
first real request never hits a cold compile (remote compiles cost minutes here;
SURVEY.md §7 'bucketing decides compile-count').

Usage: python scripts/warmup.py [--tiny]   (--tiny uses the test config for a fast check)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.api import AudioFlamingo
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime import generate as gen
    from audio_flamingo_tpu.runtime.processor import WINDOW_BUCKETS

    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--max-windows", type=int, default=4)
    p.add_argument("--max-new-tokens", type=int, default=32)
    args = p.parse_args()

    model = AudioFlamingo.from_random(
        compute_dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    cfg = model.cfg
    tpw = cfg.encoder.max_source_positions // cfg.encoder.pool_stride
    for nw in [b for b in WINDOW_BUCKETS if b <= args.max_windows]:
        ids = np.concatenate([
            np.full((1, nw * tpw), cfg.audio_token_id, np.int32),
            np.full((1, 8), 1, np.int32),
        ], axis=1)
        mels = np.zeros((1, nw, 3000, cfg.encoder.num_mel_bins), np.float32)
        t0 = time.time()
        tokens, _ = gen.generate(model.params, cfg, jnp.asarray(ids), jnp.asarray(mels),
                                 max_new_tokens=args.max_new_tokens,
                                 eos_token_id=model.eos_token_id,
                                 sampling=SamplingParams(greedy=True),
                                 compute_dtype=model.compute_dtype)
        jax.block_until_ready(tokens)
        print(f"warmed {nw}-window bucket in {time.time()-t0:.1f}s", flush=True)
    print("warmup complete", flush=True)


if __name__ == "__main__":
    main()
