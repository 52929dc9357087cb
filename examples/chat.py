"""Example: multi-turn chat with interleaved audio (AF3-Chat behavior).

python examples/chat.py [--model DIR] clip.wav
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
args = p.parse_args()

model = load(args.model) if args.model else AudioFlamingo.from_random(
    compute_dtype=jnp.float32)
wav = load_audio(args.wav, target_sr=16_000)

print("turn 1:", model.generate(sound=wav, prompt="What do you hear?", chat=True))
print("turn 2:", model.generate(prompt="Why do you think so?", chat=True))
print("turn 3 (CoT):", model.generate(prompt="Think again carefully.", chat=True,
                                      think=True))
