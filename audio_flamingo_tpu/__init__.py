"""audio_flamingo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio-language-model framework.

Re-implements the capabilities of the NVIDIA Audio Flamingo series (AF1 / AF2 / AF3 /
Music Flamingo) as a ground-up TPU-first design: fused Pallas DSP frontend, Whisper-style
and CLAP-style audio towers, Qwen2 / OPT decoders with gated cross-attention (AF1/AF2) or
LLaVA-style prefix tokens (AF3/MF), a static-shape prefill/decode runtime, and
mesh-parallel training (DP/FSDP/TP + sequence parallelism).

Reference behavior documented in SURVEY.md; numerical parity targets are the HuggingFace
PyTorch implementations of the constituent models (whisper, clap, qwen2, opt, qwen2_audio).
"""

__version__ = "0.1.0"

from audio_flamingo_tpu import config  # noqa: F401
