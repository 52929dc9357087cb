"""Training-time audio augmentation: SpecAugment (time/freq masking) + noise/gain.

SpecAugment is the standard recipe for Whisper-style encoder training (the AF training
mixes span large noisy corpora; the reference branches inherit augmentation from their
trainer stacks ⚠recon). Pure-jax, jit/vmap-safe, key-driven.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(rng: jax.Array, mels: jnp.ndarray, *, num_time_masks: int = 2,
                 max_time_frac: float = 0.05, num_freq_masks: int = 2,
                 max_freq_bins: int = 16) -> jnp.ndarray:
    """[..., frames, n_mels] log-mel -> masked copy (masked cells set to the mel mean).

    Static mask counts; widths/starts sampled per call. Works under jit/vmap.
    """
    *lead, frames, n_mels = mels.shape
    fill = mels.mean(axis=(-2, -1), keepdims=True)
    out = mels
    max_t = max(1, int(frames * max_time_frac))

    keys = jax.random.split(rng, 2 * (num_time_masks + num_freq_masks))
    ki = iter(keys)
    t_idx = jnp.arange(frames)
    f_idx = jnp.arange(n_mels)
    for _ in range(num_time_masks):
        width = jax.random.randint(next(ki), (), 0, max_t + 1)
        start = jax.random.randint(next(ki), (), 0, frames)
        mask = (t_idx >= start) & (t_idx < start + width)
        out = jnp.where(mask[..., :, None], fill, out)
    for _ in range(num_freq_masks):
        width = jax.random.randint(next(ki), (), 0, max_freq_bins + 1)
        start = jax.random.randint(next(ki), (), 0, n_mels)
        mask = (f_idx >= start) & (f_idx < start + width)
        out = jnp.where(mask[..., None, :], fill, out)
    return out


def add_noise_snr(rng: jax.Array, wav: jnp.ndarray, snr_db: float) -> jnp.ndarray:
    """Add white noise at the given SNR (dB) to a waveform [..., samples]."""
    sig_pow = jnp.mean(wav ** 2, axis=-1, keepdims=True) + 1e-12
    noise = jax.random.normal(rng, wav.shape, wav.dtype)
    noise_pow = jnp.mean(noise ** 2, axis=-1, keepdims=True)
    target = sig_pow / (10.0 ** (snr_db / 10.0))
    return wav + noise * jnp.sqrt(target / noise_pow)


def random_gain(rng: jax.Array, wav: jnp.ndarray, min_db: float = -6.0,
                max_db: float = 6.0) -> jnp.ndarray:
    g_db = jax.random.uniform(rng, (), minval=min_db, maxval=max_db)
    return wav * (10.0 ** (g_db / 20.0))
