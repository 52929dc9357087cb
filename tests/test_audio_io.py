"""Audio I/O tests: C++ decoder/resampler vs numpy reference, tone preservation."""

import io
import wave

import numpy as np
import pytest

from audio_flamingo_tpu.audio import io as aio


def _make_wav(x: np.ndarray, sr: int, width: int = 2, ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            data = (np.clip(x, -1, 1) * 32767).astype(np.int16)
        else:
            raise ValueError(width)
        if ch == 2:
            data = np.stack([data, data], axis=1)
        w.writeframes(data.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def native_lib():
    lib = aio.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native path not built")
    return lib


def test_native_wav_decode_matches_numpy(native_lib):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=8000) * 0.3).astype(np.float32)
    data = _make_wav(x, 16_000)
    ref, sr_ref = aio.decode_wav_np(data)
    got, sr = aio.decode_wav(data)
    assert sr == sr_ref == 16_000
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_decode_stereo_mono_mix(native_lib):
    t = np.arange(4000) / 16_000
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    data = _make_wav(x, 16_000, ch=2)
    got, sr = aio.decode_wav(data)
    ref, _ = aio.decode_wav_np(data)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_resample_matches_numpy(native_lib):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=48_000) * 0.2).astype(np.float32)
    ref = aio.resample_np(x, 48_000, 16_000)
    got = aio.resample(x, 48_000, 16_000)
    assert got.shape == ref.shape == (16_000,)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resample_preserves_tone_frequency():
    """A 440 Hz tone resampled 48k->16k must stay 440 Hz with ~unit amplitude."""
    sr_in, sr_out = 48_000, 16_000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = aio.resample(x, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 2000)
    assert abs(peak_hz - 440) < 2, peak_hz
    mid = y[2000:-2000]
    assert 0.95 < mid.max() < 1.05


def test_resample_upsample_roundtrip():
    """In-band content (well below Nyquist) must round-trip down->up->down closely;
    transition-band content near Nyquist is attenuated by design."""
    t = np.arange(32_000) / 8_000
    lo = (0.3 * np.sin(2 * np.pi * 700 * t) + 0.2 * np.sin(2 * np.pi * 1500 * t)).astype(
        np.float32)
    hi = aio.resample(lo, 8_000, 48_000)
    back = aio.resample(hi, 48_000, 8_000)
    np.testing.assert_allclose(back[200:-200], lo[200:-200], atol=5e-3)


def test_load_audio(tmp_path, native_lib):
    t = np.arange(48_000) / 48_000
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    p.write_bytes(_make_wav(x, 48_000))
    y = aio.load_audio(str(p), target_sr=16_000)
    assert y.shape == (16_000,)
    assert y.dtype == np.float32
