"""Example: voice-to-voice — audio question in, synthesized speech out (AF3-Chat).

python examples/voice_chat.py [--model DIR] question.wav answer.wav
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import


import argparse
import wave

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.api import AudioFlamingo, load
from audio_flamingo_tpu.audio.io import load_audio
from audio_flamingo_tpu.audio.vocoder import GriffinLim
from audio_flamingo_tpu.models import tts
from audio_flamingo_tpu.runtime.voice import StreamingTTSSession, speak_stream

p = argparse.ArgumentParser()
p.add_argument("wav_in")
p.add_argument("wav_out")
p.add_argument("--model", default=None)
args = p.parse_args()

model = load(args.model) if args.model else AudioFlamingo.from_random(
    compute_dtype=jnp.float32)
tts_cfg = tts.TTSConfig(vocab_size=model.cfg.lm.vocab_size, d_model=128, num_layers=2,
                        num_heads=4, ffn_dim=256, n_mels=80)
tts_params = tts.init(jax.random.PRNGKey(0), tts_cfg)  # load trained weights in practice
session = StreamingTTSSession(tts_params=tts_params, tts_cfg=tts_cfg,
                              vocoder=GriffinLim(n_mels=80))

wav = load_audio(args.wav_in, target_sr=16_000)
stream = model.generate(sound=wav, prompt="Answer briefly.", stream=True,
                        max_new_tokens=64)
chunks = list(speak_stream(stream, session))
out = np.concatenate(chunks) if chunks else np.zeros(1600, np.float32)
with wave.open(args.wav_out, "wb") as w:
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16_000)
    w.writeframes((np.clip(out, -1, 1) * 32767).astype(np.int16).tobytes())
print(f"wrote {len(out)/16000:.2f}s of speech to {args.wav_out}")
