"""Audio I/O: WAV decode + resample, with a native C++ fast path.

Replaces libsndfile/ffmpeg/soxr (SURVEY.md §2.10 row 9). The C++ library
(audio/cpp/audioio.cpp) is auto-built with g++ on first use and bound via ctypes; the
numpy implementations here are the always-available numerical reference (the C++ path is
golden-tested against them).

`load_audio(path, target_sr)` is the public entry: decode -> mono f32 -> resample,
matching the reference behavior of [hf] audio_utils.py:60-139 (decode to mono float32 at
the model rate).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import wave

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
# versioned artifact name: a stale pre-FLAC build must never be dlopen'd from cache
_SO_PATH = os.path.join(_CPP_DIR, "libaudioio2.so")
_lib = None


def _build_lib() -> bool:
    srcs = [os.path.join(_CPP_DIR, "audioio.cpp"), os.path.join(_CPP_DIR, "flac.cpp")]
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", *srcs, "-o", _SO_PATH],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the native library, building it on first use; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_lib():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.af_decode_wav.restype = ctypes.c_int
    lib.af_decode_wav.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                  ctypes.POINTER(ctypes.c_uint64),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.af_decode_flac.restype = ctypes.c_int
    lib.af_decode_flac.argtypes = lib.af_decode_wav.argtypes
    lib.af_resample.restype = ctypes.c_int
    lib.af_resample.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                ctypes.POINTER(ctypes.c_uint64)]
    lib.af_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


# ------------------------------------------------------------------- numpy reference

def decode_wav_np(data: bytes) -> tuple[np.ndarray, int]:
    """Reference WAV decode via the stdlib: mono float32 + sample rate."""
    import io as _io

    with wave.open(_io.BytesIO(data)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = np.where(x & 0x800000, x | ~0xFFFFFF, x).astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return x.reshape(-1, ch).mean(axis=1).astype(np.float32), sr


def resample_np(x: np.ndarray, sr_in: int, sr_out: int, zeros: int = 16,
                beta: float = 8.555) -> np.ndarray:
    """Kaiser-windowed-sinc polyphase resampler, numpy reference (matches the C++ path)."""
    if sr_in == sr_out:
        return x.astype(np.float32)
    from math import gcd

    g = gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    fc = 0.5 if L >= M else 0.5 * L / M
    half_width = zeros / (2 * fc)
    n_out = (len(x) * L) // M
    t_out = np.arange(n_out, dtype=np.float64) * (M / L)
    # build a polyphase tap bank: phase p = t_out mod 1 has L distinct values
    out = np.zeros(n_out, np.float64)
    lo = np.ceil(t_out - half_width).astype(np.int64)
    hi = np.floor(t_out + half_width).astype(np.int64)
    width = int((hi - lo).max()) + 1
    k = lo[:, None] + np.arange(width)[None, :]
    t = k - t_out[:, None]
    valid = (np.abs(t) <= half_width) & (k >= 0) & (k < len(x))
    arg = np.clip(t / half_width, -1, 1)
    win = np.i0(beta * np.sqrt(np.maximum(1 - arg ** 2, 0))) / np.i0(beta)
    s = np.where(t == 0, 2 * fc, np.sin(2 * np.pi * fc * t) / (np.pi * np.where(t == 0, 1, t)))
    taps = np.where(valid, s * win, 0.0)
    xk = np.where(valid, x[np.clip(k, 0, len(x) - 1)], 0.0)
    out = (taps * xk).sum(axis=1)
    return out.astype(np.float32)


# ----------------------------------------------------------------------- native path

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    lib = get_lib()
    if lib is None:
        return decode_wav_np(data)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_uint64()
    sr = ctypes.c_int()
    rc = lib.af_decode_wav(data, len(data), ctypes.byref(out), ctypes.byref(n),
                           ctypes.byref(sr))
    if rc != 0:
        return decode_wav_np(data)
    arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    lib.af_free(out)
    return arr, sr.value


def resample(x: np.ndarray, sr_in: int, sr_out: int, zeros: int = 16,
             beta: float = 8.555) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return resample_np(x, sr_in, sr_out, zeros, beta)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_uint64()
    rc = lib.af_resample(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
                         sr_in, sr_out, zeros, beta, ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return resample_np(x, sr_in, sr_out, zeros, beta)
    arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    lib.af_free(out)
    return arr


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC decode: native C++ (audio/cpp/flac.cpp) with the pure-Python decoder
    (audio/flac_ref.py) as fallback/cross-check."""
    lib = get_lib()
    if lib is not None:
        out = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_uint64()
        sr = ctypes.c_int()
        rc = lib.af_decode_flac(data, len(data), ctypes.byref(out), ctypes.byref(n),
                                ctypes.byref(sr))
        if rc == 0:
            arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
            lib.af_free(out)
            return arr, sr.value
    from audio_flamingo_tpu.audio.flac_ref import decode_flac_np

    return decode_flac_np(data)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Container dispatch by magic: RIFF/WAVE or native FLAC -> (mono f32, sr)."""
    if data[:4] == b"fLaC":
        return decode_flac(data)
    return decode_wav(data)


def load_audio(path: str, target_sr: int = 16_000) -> np.ndarray:
    """Decode an audio file (WAV or FLAC) to mono float32 at target_sr."""
    with open(path, "rb") as f:
        data = f.read()
    wav, sr = decode_audio(data)
    return resample(wav, sr, target_sr)
