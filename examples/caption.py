"""Example: wav in -> caption out (AF3 path).

With a real checkpoint:   python examples/caption.py --model /ckpts/af3-hf clip.wav
Smoke test (random tiny): python examples/caption.py clip.wav
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import


import argparse

import jax.numpy as jnp

from audio_flamingo_tpu.api import AudioFlamingo, load
from audio_flamingo_tpu.audio.io import load_audio

p = argparse.ArgumentParser()
p.add_argument("wav")
p.add_argument("--model", default=None)
p.add_argument("--think", action="store_true")
args = p.parse_args()

model = load(args.model) if args.model else AudioFlamingo.from_random(
    compute_dtype=jnp.float32)
wav = load_audio(args.wav, target_sr=16_000)
print(model.generate(sound=wav, prompt="Describe the audio in detail.",
                     think=args.think))
