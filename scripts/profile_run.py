"""Capture a jax.profiler trace of the headline inference phases on the attached TPU.

Usage: python scripts/profile_run.py [--logdir /tmp/af_trace]
Open the result in TensorBoard (Profile plugin) or Perfetto.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
    from audio_flamingo_tpu.config import MelConfig, WhisperEncoderConfig
    from audio_flamingo_tpu.models import whisper_encoder
    from audio_flamingo_tpu.utils.profiling import PhaseTimer, annotate, trace

    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="/tmp/af_trace")
    args = p.parse_args()

    cfg = WhisperEncoderConfig(use_flash=True)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          whisper_encoder.init(jax.random.PRNGKey(0), cfg))
    fe = WhisperMelFrontend(MelConfig(num_mel_bins=128), use_pallas=True)
    wav = jnp.asarray((np.random.default_rng(0).normal(size=(20, 480_000)) * 0.1)
                      .astype(np.float32))

    # warm up (compile outside the trace)
    mels = fe._window_mels(wav).astype(jnp.bfloat16)
    out = whisper_encoder.apply(params, cfg, mels, compute_dtype=jnp.bfloat16)
    jax.block_until_ready(out)

    timer = PhaseTimer()
    with trace(args.logdir):
        for _ in range(3):
            with annotate("mel_frontend"), timer.phase("mel") as ph:
                mels = fe._window_mels(wav).astype(jnp.bfloat16)
                ph["result"] = mels
            with annotate("encoder"), timer.phase("encoder") as ph:
                out = whisper_encoder.apply(params, cfg, mels, compute_dtype=jnp.bfloat16)
                ph["result"] = out
    print("trace written to", args.logdir)
    for name, stats in timer.summary().items():
        print(f"{name}: mean {stats['mean_s']*1e3:.1f} ms over {stats['count']} runs")


if __name__ == "__main__":
    main()
