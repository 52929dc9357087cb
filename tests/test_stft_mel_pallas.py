"""Fused Pallas log-mel kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
from audio_flamingo_tpu.config import MelConfig

jax.config.update("jax_default_matmul_precision", "highest")


def test_fused_log_mel_matches_reference():
    from unittest import mock
    from jax.experimental import pallas as pl

    cfg = MelConfig(num_mel_bins=128)
    fe = WhisperMelFrontend(cfg)
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 480_000)) * 0.1).astype(np.float32)
    ref = np.asarray(fe._window_mels(jnp.asarray(wav)))

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        from audio_flamingo_tpu.ops.pallas.stft_mel import fused_log_mel

        out = np.asarray(fused_log_mel(jnp.asarray(wav), fe.dft_cos, fe.dft_sin,
                                       fe.mel_weights, cfg.hop_length, fe.frames_per_window))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)
