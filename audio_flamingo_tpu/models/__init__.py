from audio_flamingo_tpu.models import whisper_encoder, qwen2

__all__ = ["whisper_encoder", "qwen2"]
