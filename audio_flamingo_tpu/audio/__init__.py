from audio_flamingo_tpu.audio.mel import (
    WhisperMelFrontend,
    mel_filter_bank,
)

__all__ = ["WhisperMelFrontend", "mel_filter_bank"]
