"""CLAP mel frontend (AF1/AF2): 48 kHz dB log-mel with dual filterbanks + fusion crops.

Numerical reference (golden-tested): [hf] models/clap/feature_extraction_clap.py —
dual banks :120-137 (htk/no-norm for 'fusion', slaney/slaney for 'rand_trunc'),
dB mel :155-176 (power_to_db = 10*log10(max(x, 1e-10))), fusion stack :177-200
(global bilinear shrink + 3 random crops as a 4-channel mel), mode dispatch :208-262
(repeat / repeatpad tiling then zero-pad for short audio).

The STFT is the same MXU matmul machinery as the Whisper frontend (exact strided-slice
framing, windowed rDFT basis), shared via module helpers. Crop/pad decisions are
host-side numpy (seeded rng), matching the reference's host preprocessing.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.audio.mel import _windowed_dft_basis, mel_filter_bank
from audio_flamingo_tpu.config import ClapMelConfig
from audio_flamingo_tpu.models.clap import bicubic_interp_matrix  # noqa: F401 (re-export)


def frame_signal(padded: jnp.ndarray, n_fft: int, hop: int, num_frames: int) -> jnp.ndarray:
    """[N, L] centered-padded signal -> [N, num_frames, n_fft], exact strided slices."""
    g = math.gcd(hop, n_fft)
    bh, bw = hop // g, n_fft // g
    total = padded.shape[1]
    pad_to = -(-total // g) * g
    need = ((num_frames - 1) * bh + bw) * g
    pad_to = max(pad_to, need)
    if pad_to != total:
        padded = jnp.pad(padded, ((0, 0), (0, pad_to - total)))
    blocks = padded.reshape(padded.shape[0], pad_to // g, g)
    parts = [blocks[:, k: k + (num_frames - 1) * bh + 1: bh] for k in range(bw)]
    return jnp.concatenate(parts, axis=-1).reshape(padded.shape[0], num_frames, n_fft)


def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Torch bilinear align_corners=False 1D interpolation matrix [n_out, n_in]."""
    w = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        f = int(np.floor(src))
        frac = src - f
        i0, i1 = min(max(f, 0), n_in - 1), min(max(f + 1, 0), n_in - 1)
        w[i, i0] += 1 - frac
        w[i, i1] += frac
    return w


class ClapMelFrontend:
    """10 s (max) 48 kHz clips -> [4|1, T, 64] dB log-mel, HF-CLAP-parity."""

    def __init__(self, cfg: ClapMelConfig = ClapMelConfig(), seed: int = 0):
        self.cfg = cfg
        self.max_samples = cfg.max_length_s * cfg.sampling_rate
        self.num_frames_max = self.max_samples // cfg.hop_length + 1  # 1001
        n_bins = cfg.n_fft // 2 + 1
        self.mel_htk = jnp.asarray(mel_filter_bank(
            n_bins, cfg.num_mel_bins, cfg.fmin, cfg.fmax, cfg.sampling_rate,
            norm=None, mel_scale="htk"), jnp.float32)
        self.mel_slaney = jnp.asarray(mel_filter_bank(
            n_bins, cfg.num_mel_bins, cfg.fmin, cfg.fmax, cfg.sampling_rate,
            norm="slaney", mel_scale="slaney"), jnp.float32)
        c, s = _windowed_dft_basis(cfg.n_fft)
        self.dft_cos = jnp.asarray(c, jnp.float32)
        self.dft_sin = jnp.asarray(s, jnp.float32)
        self.rng = np.random.default_rng(seed)

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def _db_mel(self, wav: jnp.ndarray, num_frames: int, use_htk: bool) -> jnp.ndarray:
        """[N, L] f32 -> [N, num_frames, n_mels] dB mel (10*log10, floor 1e-10)."""
        hi = jax.lax.Precision.HIGHEST
        half = self.cfg.n_fft // 2
        padded = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
        frames = frame_signal(padded, self.cfg.n_fft, self.cfg.hop_length, num_frames)
        re = jnp.einsum("nfw,wk->nfk", frames, self.dft_cos, precision=hi)
        im = jnp.einsum("nfw,wk->nfk", frames, self.dft_sin, precision=hi)
        power = re * re + im * im
        bank = self.mel_htk if use_htk else self.mel_slaney
        mel = jnp.einsum("nfk,km->nfm", power, bank, precision=hi)
        return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

    def window_chunks_device(self, wav: jnp.ndarray, n: int,
                             padding: str) -> jnp.ndarray:
        """Device-resident window split: [true_len] waveform already on device
        -> [n, max_samples] chunks, tail `_pad_short` tiling included — a
        handful of EAGER static-shape ops (the true length is host-known), so
        no traced gather (a [n, max_s] take_along_axis measured 166 ms on TPU
        vs ~6 ms of eager slice/tile/concat dispatches) and no host round-trip.

        Tail replication matches `_pad_short` ('repeat' tiles n_rep+1 times
        then truncates; 'repeatpad' tiles n_rep times then zero-pads; 'pad'
        zero-pads — [hf] feature_extraction_clap.py:208-233). Bucket-pad rows
        beyond the audio are zeros."""
        max_s = self.max_samples
        true_len = int(wav.shape[0])
        n_full = min(true_len // max_s, n)
        parts = []
        if n_full:
            parts.append(wav[: n_full * max_s].reshape(n_full, max_s))
        tail_len = min(true_len, n * max_s) - n_full * max_s
        if tail_len > 0:
            tail = wav[n_full * max_s: n_full * max_s + tail_len]
            n_rep = max_s // tail_len
            if padding == "repeat":
                tiled = jnp.tile(tail, n_rep + 1)[:max_s]
            elif padding == "repeatpad":
                tiled = jnp.pad(jnp.tile(tail, max(n_rep, 1)),
                                (0, max_s - max(n_rep, 1) * tail_len))
            else:
                tiled = jnp.pad(tail, (0, max_s - tail_len))
            parts.append(tiled[None])
        n_zero = n - n_full - (1 if tail_len > 0 else 0)
        if n_zero:
            parts.append(jnp.zeros((n_zero, max_s), wav.dtype))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def _pad_short(self, wav: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        if len(wav) < self.max_samples:
            n_rep = int(self.max_samples / len(wav))
            if cfg.padding == "repeat":
                wav = np.tile(wav, n_rep + 1)[: self.max_samples]
            elif cfg.padding == "repeatpad":
                wav = np.tile(wav, max(n_rep, 1))
            wav = np.pad(wav, (0, self.max_samples - len(wav)))
        return wav

    def __call__(self, wav: np.ndarray, truncation: str | None = None):
        """Mono 48 kHz f32 waveform -> (mel [C, T, n_mels] f32, is_longer bool).

        C=4 for 'fusion' (global shrink + 3 crops), C=1 for 'rand_trunc'.
        """
        cfg = self.cfg
        truncation = truncation or cfg.truncation
        wav = np.asarray(wav, np.float32)
        if len(wav) > self.max_samples:
            if truncation == "rand_trunc":
                idx = int(self.rng.integers(0, len(wav) - self.max_samples + 1))
                wav = wav[idx: idx + self.max_samples]
                mel = self._db_mel(jnp.asarray(wav[None]), self.num_frames_max, False)
                return np.asarray(mel[0])[None], True
            # fusion on the full-length mel
            num_frames = len(wav) // cfg.hop_length + 1
            mel = np.asarray(self._db_mel(jnp.asarray(wav[None]), num_frames, True)[0])
            chunk = self.num_frames_max
            if chunk == num_frames:
                return np.stack([mel] * 4), False
            return self._fusion_stack(mel, num_frames, chunk), True
        wav = self._pad_short(wav)
        if truncation == "fusion":
            mel = np.asarray(self._db_mel(jnp.asarray(wav[None]), self.num_frames_max, True)[0])
            return np.stack([mel] * 4), False
        mel = np.asarray(self._db_mel(jnp.asarray(wav[None]), self.num_frames_max, False)[0])
        return mel[None], False

    def _fusion_stack(self, mel: np.ndarray, total: int, chunk: int) -> np.ndarray:
        """[hf] _random_mel_fusion: bilinear global shrink + 3 random range crops."""
        ranges = np.array_split(list(range(0, total - chunk + 1)), 3)
        ranges = [r if len(r) else [0] for r in ranges]
        idxs = [int(self.rng.choice(r)) for r in ranges]
        crops = [mel[i: i + chunk] for i in idxs]
        shrink = _bilinear_matrix(total, chunk) @ mel
        return np.stack([shrink.astype(np.float32)] + crops, axis=0)
