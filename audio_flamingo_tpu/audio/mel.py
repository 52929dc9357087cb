"""Log-mel STFT frontend, TPU-first.

The STFT is expressed as matmuls against a windowed real-DFT basis so the whole frontend
(frame -> window -> rFFT -> power -> mel -> log10 -> clamp -> scale) runs as MXU work under
one jit; there is no FFT primitive in the hot path and no host DSP. The mel filterbank and
DFT basis are host-side numpy constants.

Numerical reference (golden-tested):
- mel filterbank: [hf] audio_utils.py:440-533 (`mel_filter_bank`, slaney norm + slaney scale)
- STFT/log path: [hf] models/whisper/feature_extraction_whisper.py:108-167 (periodic Hann,
  center=True reflect padding, power=2, mel floor 1e-10, log10, drop last frame,
  clamp at max-8.0, (x+4)/4)
- chunking: 30 s windows of 480_000 samples zero-padded (silence), no attention mask
  ([hf] feature_extraction_whisper.py:77-95)

The max-8.0 clamp is a per-window global reduction; windows are independent (matches
running the HF extractor once per 30 s window), so window-parallel evaluation is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import MelConfig


# --------------------------------------------------------------------------------------
# Host-side constants (numpy): mel filterbank + windowed DFT basis
# --------------------------------------------------------------------------------------

def _hertz_to_mel(freq, mel_scale: str = "slaney"):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    high = freq >= min_log_hertz
    mels = np.where(high, min_log_mel + np.log(np.maximum(freq, 1e-12) / min_log_hertz) * logstep, mels)
    return mels


def _mel_to_hertz(mels, mel_scale: str = "slaney"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    high = mels >= min_log_mel
    return np.where(high, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)


def mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
    norm: str | None = "slaney",
    mel_scale: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank [num_frequency_bins, num_mel_filters], HF-equivalent math."""
    mel_min = _hertz_to_mel(min_frequency, mel_scale)
    mel_max = _hertz_to_mel(max_frequency, mel_scale)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz(mel_freqs, mel_scale)
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    # triangular filters: rising/falling slopes between consecutive filter frequencies
    filter_diff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    filters = np.maximum(np.zeros(1), np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (filter_freqs[2: num_mel_filters + 2] - filter_freqs[:num_mel_filters])
        filters *= np.expand_dims(enorm, 0)
    return filters.astype(np.float64)


def _windowed_dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases with the periodic Hann window folded in.

    Returns (C, S) of shape [n_fft, n_fft//2 + 1] such that for a frame x[0:n_fft]:
      Re(FFT(hann*x))[k] = x @ C[:, k],  Im = -(x @ S[:, k]);  power = (x@C)^2 + (x@S)^2.
    """
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[None, :].astype(np.float64)
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))  # periodic
    ang = 2.0 * np.pi * n * k / n_fft
    c = np.cos(ang) * hann[:, None]
    s = np.sin(ang) * hann[:, None]
    return c, s


# --------------------------------------------------------------------------------------
# Device-side frontend
# --------------------------------------------------------------------------------------

class WhisperMelFrontend:
    """Whisper-style log-mel frontend; `__call__` maps [batch, n_samples] -> [batch, frames, mels].

    n_samples must be a multiple of the 30 s window (pad on host or with `pad_or_trim`).
    Each 30 s window is normalized independently (its own max-8 clamp), matching the HF
    extractor applied per window.
    """

    def __init__(self, cfg: MelConfig = MelConfig(), use_pallas: bool = False):
        self.cfg = cfg
        self.window_samples = cfg.chunk_length_s * cfg.sampling_rate
        self.frames_per_window = self.window_samples // cfg.hop_length  # 3000
        n_bins = cfg.n_fft // 2 + 1
        mel = mel_filter_bank(n_bins, cfg.num_mel_bins, cfg.fmin, cfg.fmax, cfg.sampling_rate)
        c, s = _windowed_dft_basis(cfg.n_fft)
        self.mel_weights = jnp.asarray(mel, dtype=jnp.float32)        # [n_bins, n_mels]
        self.dft_cos = jnp.asarray(c, dtype=jnp.float32)              # [n_fft, n_bins]
        self.dft_sin = jnp.asarray(s, dtype=jnp.float32)
        self.use_pallas = use_pallas

    def pad_or_trim(self, wav: np.ndarray, num_windows: int | None = None) -> np.ndarray:
        """Host-side: zero-pad (silence) to a whole number of 30 s windows."""
        wav = np.asarray(wav, dtype=np.float32)
        if num_windows is None:
            num_windows = max(1, -(-len(wav) // self.window_samples))
        total = num_windows * self.window_samples
        out = np.zeros(total, dtype=np.float32)
        out[: min(len(wav), total)] = wav[:total]
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[batch, k*window_samples] float32 -> [batch, k*3000, num_mel_bins] float32."""
        if wav.ndim == 1:
            wav = wav[None]
        b, n = wav.shape
        k = n // self.window_samples
        assert k * self.window_samples == n, (n, self.window_samples)
        wins = wav.reshape(b * k, self.window_samples)
        mels = self._window_mels(wins)                       # [b*k, 3000, n_mels]
        return mels.reshape(b, k * self.frames_per_window, self.cfg.num_mel_bins)

    def _frames(self, wins: jnp.ndarray) -> jnp.ndarray:
        """Centered framing with reflect padding: [N, win_samples] -> [N, F, n_fft].

        HF computes 1 + n//hop = 3001 frames and drops the last; we materialize only the
        kept F=3000. Framing is exact data movement (strided slices over gcd-sized blocks),
        NOT a conv — conv-based patch extraction routes through inexact conv backends.
        Frame f covers padded[f*hop : f*hop + n_fft].
        """
        import math

        cfg = self.cfg
        half = cfg.n_fft // 2
        nf = self.frames_per_window
        padded = jnp.pad(wins, ((0, 0), (half, half)), mode="reflect")
        g = math.gcd(cfg.hop_length, cfg.n_fft)
        bh = cfg.hop_length // g        # blocks per hop
        bw = cfg.n_fft // g             # blocks per frame
        n_blocks_needed = (nf - 1) * bh + bw
        total = padded.shape[1]
        pad_to = -(-total // g) * g
        if pad_to != total:
            padded = jnp.pad(padded, ((0, 0), (0, pad_to - total)))
        blocks = padded.reshape(padded.shape[0], pad_to // g, g)
        assert n_blocks_needed <= pad_to // g, (n_blocks_needed, pad_to // g)
        parts = [blocks[:, k: k + (nf - 1) * bh + 1: bh] for k in range(bw)]
        return jnp.concatenate(parts, axis=-1).reshape(wins.shape[0], nf, cfg.n_fft)

    def _window_mels(self, wins: jnp.ndarray) -> jnp.ndarray:
        """[N, window_samples] -> [N, 3000, n_mels] with per-window normalization."""
        if self.use_pallas:
            from audio_flamingo_tpu.ops.pallas.stft_mel import fused_log_mel
            return fused_log_mel(wins, self.dft_cos, self.dft_sin, self.mel_weights,
                                 self.cfg.hop_length, self.frames_per_window)
        # Full f32 matmul precision: JAX's default downcasts f32 matmuls (bf16 on the MXU),
        # which costs ~1e-2 absolute error in log-mel space. The frontend is ~1 GFLOP per
        # 30 s window (negligible vs the encoder), so run it at HIGHEST.
        hi = jax.lax.Precision.HIGHEST
        frames = self._frames(wins)                                   # [N, F, n_fft]
        re = jnp.einsum("nfw,wk->nfk", frames, self.dft_cos, precision=hi)
        im = jnp.einsum("nfw,wk->nfk", frames, self.dft_sin, precision=hi)
        power = re * re + im * im                                     # [N, F, n_bins]
        mel = jnp.einsum("nfk,km->nfm", power, self.mel_weights, precision=hi)
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)            # per 30 s window
        log_spec = jnp.maximum(log_spec, mx - 8.0)
        return (log_spec + 4.0) / 4.0


def num_audio_tokens(num_windows: int, pool_stride: int = 2, tokens_per_window: int = 1500) -> int:
    """Prefix tokens contributed by `num_windows` 30 s windows after encoder pooling.

    Matches [hf] models/qwen2_audio/modeling_qwen2_audio.py:450-456 for whole windows.
    """
    return num_windows * (tokens_per_window // pool_stride)
