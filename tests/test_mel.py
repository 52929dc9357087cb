"""Golden tests: log-mel frontend vs the HF Whisper feature extractor (numpy path).

Reference: [hf] models/whisper/feature_extraction_whisper.py:108-136.
"""

import numpy as np
import pytest

from audio_flamingo_tpu.audio.mel import WhisperMelFrontend, mel_filter_bank
from audio_flamingo_tpu.config import MelConfig


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor(feature_size=128)


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel_filter_bank(201, 128, 0.0, 8000.0, 16000, norm="slaney", mel_scale="slaney")
    theirs = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_log_mel_matches_hf_single_window(hf_extractor):
    rng = np.random.default_rng(0)
    wav = rng.normal(size=16000 * 7).astype(np.float32) * 0.1  # 7 s -> zero-padded to 30 s
    fe = hf_extractor(wav, sampling_rate=16000, return_tensors="np")
    ref = fe["input_features"][0]  # [128, 3000]

    frontend = WhisperMelFrontend(MelConfig(num_mel_bins=128))
    padded = frontend.pad_or_trim(wav, num_windows=1)
    ours = np.asarray(frontend(padded[None]))[0]  # [3000, 128]
    np.testing.assert_allclose(ours.T, ref, atol=2e-4, rtol=1e-4)


def test_log_mel_multi_window_equals_per_window(hf_extractor):
    """Window independence of the max-8 clamp: batched multi-window == per-window HF calls."""
    rng = np.random.default_rng(1)
    wav = rng.normal(size=16000 * 65).astype(np.float32) * 0.05  # 65 s -> 3 windows
    frontend = WhisperMelFrontend(MelConfig(num_mel_bins=128))
    padded = frontend.pad_or_trim(wav)  # 3 windows
    ours = np.asarray(frontend(padded[None]))[0]  # [9000, 128]

    for w in range(3):
        chunk = padded[w * 480_000: (w + 1) * 480_000]
        ref = hf_extractor(chunk, sampling_rate=16000, return_tensors="np")["input_features"][0]
        np.testing.assert_allclose(ours[w * 3000: (w + 1) * 3000].T, ref, atol=2e-4, rtol=1e-4)


def test_silence_window():
    """All-zero (padding) windows must not NaN and hit the mel floor."""
    frontend = WhisperMelFrontend(MelConfig(num_mel_bins=128))
    out = np.asarray(frontend(np.zeros((1, 480_000), np.float32)))
    assert np.isfinite(out).all()
