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


# ------------------------------------------------------------------------------- FLAC

def _flac_roundtrip(samples, sr, **kw):
    from audio_flamingo_tpu.audio.flac_ref import decode_flac_np, encode_flac
    from audio_flamingo_tpu.audio.io import decode_flac, get_lib

    data = encode_flac(samples, sr, **kw)
    got_py, sr_py = decode_flac_np(data)
    got, sr_out = decode_flac(data)
    np.testing.assert_array_equal(got, got_py)  # C++ == pure-Python decoder
    assert sr_out == sr_py == sr
    return got, data


def _expected_mono(samples, bps):
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    return (x.mean(axis=1) / (1 << (bps - 1))).astype(np.float32)


def test_flac_roundtrip_mono_16bit():
    """FLAC is lossless: decode(encode(x)) must reproduce x exactly (fixed predictors,
    Rice residuals, partial final frame)."""
    rng = np.random.default_rng(0)
    t = np.arange(10_000) / 16_000
    wav = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=t.shape))
    samples = np.clip(wav * 32767, -32768, 32767).astype(np.int64)
    got, _ = _flac_roundtrip(samples, 16_000, bps=16, block_size=4096)
    np.testing.assert_allclose(got, _expected_mono(samples, 16), atol=0)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_flac_stereo_decorrelation_modes(mode):
    rng = np.random.default_rng(1)
    n = 5000
    left = np.clip(rng.normal(size=n) * 8000, -32768, 32767).astype(np.int64)
    right = np.clip(left * 0.8 + rng.normal(size=n) * 800, -32768, 32767).astype(np.int64)
    samples = np.stack([left, right], axis=1)
    got, _ = _flac_roundtrip(samples, 44_100, bps=16, block_size=1024, stereo_mode=mode)
    np.testing.assert_allclose(got, _expected_mono(samples, 16), atol=0)


@pytest.mark.parametrize("bps", [8, 24])
def test_flac_bit_depths(bps):
    rng = np.random.default_rng(2)
    lim = (1 << (bps - 1)) - 1
    samples = np.clip(rng.normal(size=3000) * lim * 0.3, -lim, lim).astype(np.int64)
    got, _ = _flac_roundtrip(samples, 48_000, bps=bps, block_size=512)
    np.testing.assert_allclose(got, _expected_mono(samples, bps), atol=0)


def test_flac_rice_partitions():
    """partition_order > 0: per-partition Rice parameters decode correctly."""
    rng = np.random.default_rng(3)
    # piecewise variance so partitions pick different rice params
    a = (rng.normal(size=2048) * 100).astype(np.int64)
    b = (rng.normal(size=2048) * 20000).astype(np.int64)
    samples = np.clip(np.concatenate([a, b]), -32768, 32767)
    got, data = _flac_roundtrip(samples, 16_000, bps=16, block_size=4096,
                                partition_order=2)
    np.testing.assert_allclose(got, _expected_mono(samples, 16), atol=0)


def test_flac_constant_subframe():
    samples = np.full(2000, -123, np.int64)
    got, _ = _flac_roundtrip(samples, 8000, bps=16, block_size=512)
    np.testing.assert_allclose(got, _expected_mono(samples, 16), atol=0)


def test_load_audio_flac_resamples(tmp_path):
    """load_audio dispatches FLAC by magic and resamples to the model rate."""
    from audio_flamingo_tpu.audio.flac_ref import encode_flac
    from audio_flamingo_tpu.audio.io import load_audio

    sr_in = 48_000
    t = np.arange(sr_in) / sr_in
    wav = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples = (wav * 32767).astype(np.int64)
    p = tmp_path / "tone.flac"
    p.write_bytes(encode_flac(samples, sr_in, bps=16))
    out = load_audio(str(p), target_sr=16_000)
    assert abs(len(out) - 16_000) <= 2
    # 440 Hz tone survives decode+resample: dominant FFT bin within 2 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freq = np.fft.rfftfreq(len(out), 1 / 16_000)[spec.argmax()]
    assert abs(freq - 440.0) < 2.0, freq
