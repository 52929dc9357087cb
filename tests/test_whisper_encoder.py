"""Golden test: Whisper-style encoder vs [hf] WhisperEncoder on a small random config."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import WhisperEncoderConfig
from audio_flamingo_tpu.io.hf_import import import_whisper_encoder
from audio_flamingo_tpu.models import whisper_encoder

jax.config.update("jax_default_matmul_precision", "highest")

CFG = WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=2, num_heads=4,
                           ffn_dim=64, max_source_positions=50, pool_stride=1)


@pytest.fixture(scope="module")
def hf_encoder():
    from transformers.models.whisper.configuration_whisper import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    hf_cfg = WhisperConfig(
        num_mel_bins=16, d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, max_source_positions=50, activation_function="gelu",
    )
    torch.manual_seed(0)
    enc = WhisperEncoder(hf_cfg).eval()
    return enc


def test_encoder_matches_hf(hf_encoder):
    sd = {k: v.numpy() for k, v in hf_encoder.state_dict().items()}
    params = import_whisper_encoder(sd, CFG)
    rng = np.random.default_rng(0)
    mels = rng.normal(size=(2, 100, 16)).astype(np.float32)  # 100 frames -> 50 tokens
    with torch.no_grad():
        ref = hf_encoder(torch.from_numpy(mels.transpose(0, 2, 1))).last_hidden_state.numpy()
    ours = np.asarray(whisper_encoder.apply(params, CFG, jnp.asarray(mels)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_pool_output_matches_avgpool():
    x = np.arange(24, dtype=np.float32).reshape(1, 6, 4)
    ref = torch.nn.functional.avg_pool1d(torch.from_numpy(x).transpose(1, 2), 2, 2)
    ours = whisper_encoder.pool_output(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(), atol=1e-6)


def test_random_init_runs():
    params = whisper_encoder.init(jax.random.PRNGKey(0), CFG)
    out = whisper_encoder.apply(params, CFG, jnp.zeros((1, 100, 16)))
    assert out.shape == (1, 50, 32)
    assert bool(jnp.isfinite(out).all())
