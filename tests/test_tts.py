"""TTS head + vocoder tests: shapes, streaming==batch, Griffin-Lim frequency recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.audio.vocoder import GriffinLim
from audio_flamingo_tpu.models import tts
from audio_flamingo_tpu.runtime.voice import StreamingTTSSession, speak_stream

jax.config.update("jax_default_matmul_precision", "highest")

CFG = tts.TTSConfig(vocab_size=128, d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
                    n_mels=16, chunk_tokens=4, frames_per_chunk=8, state_frames=2)


@pytest.fixture(scope="module")
def params():
    return tts.init(jax.random.PRNGKey(0), CFG)


def test_chunk_shapes(params):
    ids = jnp.asarray([[1, 2, 3, 4]])
    state = jnp.zeros((1, 2, 16))
    mel = tts.synthesize_chunk(params, CFG, ids, state)
    assert mel.shape == (1, 8, 16)
    assert bool(jnp.isfinite(mel).all())


def test_full_synthesis_chunking(params):
    mel = tts.synthesize(params, CFG, [1, 2, 3, 4, 5, 6])  # 6 tokens -> 2 chunks
    assert mel.shape == (16, 16)


def test_state_carries_between_chunks(params):
    """Continuity state must influence the next chunk."""
    ids = jnp.asarray([[5, 6, 7, 8]])
    s0 = jnp.zeros((1, 2, 16))
    s1 = jnp.ones((1, 2, 16))
    m0 = tts.synthesize_chunk(params, CFG, ids, s0)
    m1 = tts.synthesize_chunk(params, CFG, ids, s1)
    assert float(jnp.abs(m0 - m1).max()) > 1e-5


def test_streaming_session_matches_batch(params):
    gl = GriffinLim(n_mels=16, n_iter=2)
    sess = StreamingTTSSession(tts_params=params, tts_cfg=CFG, vocoder=gl)
    toks = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    chunks = list(speak_stream(iter(toks), sess))
    assert len(chunks) == 3  # 2 full chunks + flush
    assert all(np.isfinite(c).all() for c in chunks)
    # each full chunk is frames_per_chunk * hop samples
    assert chunks[0].shape == (8 * 160,)


def test_griffin_lim_recovers_tone_frequency():
    """Synthesize the log-mel of a 440 Hz tone, invert, check the dominant frequency."""
    from audio_flamingo_tpu.audio.mel import WhisperMelFrontend, mel_filter_bank
    from audio_flamingo_tpu.config import MelConfig

    sr = 16_000
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    gl = GriffinLim(n_mels=80, n_iter=24)
    # analysis: plain log10 mel (no whisper clamp/scale)
    fe = WhisperMelFrontend(MelConfig(num_mel_bins=80))
    half = 200
    padded = jnp.pad(jnp.asarray(wav)[None], ((0, 0), (half, half)), mode="reflect")
    from audio_flamingo_tpu.audio.clap_mel import frame_signal

    frames = frame_signal(padded, 400, 160, 100)[0]
    power = (frames @ gl.C) ** 2 + (frames @ gl.S) ** 2
    logmel = jnp.log10(jnp.maximum(power @ gl.mel, 1e-10))

    out = gl.mel_to_waveform(logmel)
    assert out.shape == (100 * 160,)
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * sr / len(out)
    assert abs(peak_hz - 440) < 15, peak_hz
