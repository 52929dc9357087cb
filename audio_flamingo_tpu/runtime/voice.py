"""Voice-out session: LM token stream -> streaming TTS -> waveform chunks.

AF3-Chat wiring (SURVEY.md §2.7): the decode streamer ([hf] generation/utils.py:2855-2857
semantics = runtime/generate.generate_stream) feeds the TTS head chunk-by-chunk; each full
chunk of text tokens becomes ~frames_per_chunk*10 ms of audio immediately, so speech
starts before the LM finishes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

import jax.numpy as jnp

from audio_flamingo_tpu.audio.vocoder import GriffinLim
from audio_flamingo_tpu.models.tts import TTSConfig, synthesize_chunk


@dataclass
class StreamingTTSSession:
    tts_params: dict
    tts_cfg: TTSConfig
    vocoder: object = None         # default: the trained NeuralVocoder
    #                                (audio.neural_vocoder.default_vocoder, round-3
    #                                default); pass a GriffinLim for the zero-setup
    #                                DSP fallback — both duck-typed on
    #                                .mel_to_waveform(log_mel)
    pad_id: int = 0
    speaker: int | None = None     # voice id when tts_cfg.num_speakers > 0
    _buf: list = field(default_factory=list)
    _state: object = None

    def __post_init__(self):
        if self.vocoder is None:
            from audio_flamingo_tpu.audio.neural_vocoder import default_vocoder

            self.vocoder = default_vocoder()
        self._state = jnp.zeros((1, self.tts_cfg.state_frames, self.tts_cfg.n_mels),
                                jnp.float32)
        self._speaker = (None if self.speaker is None
                         else jnp.asarray([self.speaker], jnp.int32))

    def feed(self, token_id: int) -> np.ndarray | None:
        """Add one LM token; returns a waveform chunk when a full token chunk is ready."""
        self._buf.append(int(token_id))
        if len(self._buf) < self.tts_cfg.chunk_tokens:
            return None
        return self._emit(self._buf[: self.tts_cfg.chunk_tokens], flush_len=None)

    def flush(self) -> np.ndarray | None:
        """Synthesize whatever remains in the buffer (padded to a full chunk)."""
        if not self._buf:
            return None
        chunk = self._buf + [self.pad_id] * (self.tts_cfg.chunk_tokens - len(self._buf))
        return self._emit(chunk, flush_len=len(self._buf))

    def _emit(self, chunk: list[int], flush_len: int | None) -> np.ndarray:
        ids = jnp.asarray([chunk], jnp.int32)
        mel = synthesize_chunk(self.tts_params, self.tts_cfg, ids, self._state,
                               self._speaker)
        self._state = mel[:, -self.tts_cfg.state_frames:]
        self._buf = self._buf[self.tts_cfg.chunk_tokens:] if flush_len is None else []
        return self.vocoder.mel_to_waveform(mel[0])


def speak_stream(token_iter: Iterator[int], session: StreamingTTSSession) -> Iterator[np.ndarray]:
    """Wrap a generate_stream token iterator into waveform chunks."""
    for tok in token_iter:
        chunk = session.feed(tok)
        if chunk is not None:
            yield chunk
    tail = session.flush()
    if tail is not None:
        yield tail
