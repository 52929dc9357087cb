"""Full-system golden test: raw WAV -> greedy tokens, ours vs HF qwen2_audio —
exercises the mel frontend + encoder + scatter + LM + decode loop together
(BASELINE.json parity gate, demonstrated from raw samples)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
from audio_flamingo_tpu.config import AF3Config, MelConfig, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.io.hf_import import import_qwen2_audio
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen

jax.config.update("jax_default_matmul_precision", "highest")

AUDIO_TOKEN = 120
EOS = 127
# tiny "30s window" = 1 s -> 100 mel frames -> 50 encoder positions -> 25 audio tokens
CHUNK_S = 1
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=2, num_heads=4,
                                 ffn_dim=64, max_source_positions=50, pool_stride=2),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, rope_theta=1e6, tie_word_embeddings=False),
    audio_token_id=AUDIO_TOKEN,
    mel=MelConfig(num_mel_bins=16, chunk_length_s=CHUNK_S),
)


@pytest.fixture(scope="module")
def hf():
    from transformers import WhisperFeatureExtractor
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFQwen2Config
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
    )
    from transformers.models.qwen2_audio.modeling_qwen2_audio import (
        Qwen2AudioForConditionalGeneration,
    )

    fe = WhisperFeatureExtractor(feature_size=16, chunk_length=CHUNK_S)
    aud = Qwen2AudioEncoderConfig(num_mel_bins=16, d_model=32, encoder_layers=2,
                                  encoder_attention_heads=4, encoder_ffn_dim=64,
                                  max_source_positions=50)
    txt = HFQwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                        rope_theta=1e6, tie_word_embeddings=False, attention_dropout=0.0,
                        eos_token_id=EOS, bos_token_id=0, pad_token_id=0)
    cfg = Qwen2AudioConfig(audio_config=aud.to_dict(), text_config=txt.to_dict(),
                           audio_token_id=AUDIO_TOKEN)
    torch.manual_seed(1)
    model = Qwen2AudioForConditionalGeneration(cfg).eval()
    return fe, model


def test_raw_wav_to_tokens_matches_hf(hf):
    hf_fe, hf_model = hf
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=int(16_000 * 0.6)) * 0.3).astype(np.float32)  # 0.6 s clip -> zero-padded to 1 s

    # HF path: extractor (pads to the 1 s window) -> generate
    feats = hf_fe(wav, sampling_rate=16_000, return_tensors="np")["input_features"]
    ids = np.array([[5, 6] + [AUDIO_TOKEN] * 25 + [9, 10]])
    with torch.no_grad():
        ref = hf_model.generate(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(feats),
            feature_attention_mask=torch.ones((1, 100), dtype=torch.long),
            max_new_tokens=10, do_sample=False,
        ).numpy()[0, ids.shape[1]:]

    # our path: frontend -> generate, from the same raw samples
    frontend = WhisperMelFrontend(CFG.mel)
    padded = frontend.pad_or_trim(wav, num_windows=1)
    mels = np.asarray(frontend(padded[None]))[None]              # [1, 1, 100, 16]
    params = import_qwen2_audio({k: v.numpy() for k, v in hf_model.state_dict().items()},
                                CFG)
    tokens, lengths = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                                   max_new_tokens=10, eos_token_id=EOS,
                                   sampling=SamplingParams(greedy=True),
                                   compute_dtype=jnp.float32)
    ours = np.asarray(tokens)[0][: int(lengths[0])]
    np.testing.assert_array_equal(ours[: len(ref)], ref[: len(ours)])


def test_raw_wav_logit_divergence_under_1e3(hf):
    """BASELINE gate: <=1e-3 logit divergence vs the PyTorch reference, from raw wav."""
    hf_fe, hf_model = hf
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=int(16_000 * 0.7)) * 0.2).astype(np.float32)
    feats = hf_fe(wav, sampling_rate=16_000, return_tensors="np")["input_features"]
    ids = np.array([[5] + [AUDIO_TOKEN] * 25 + [9, 10, 11]])
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(feats),
            feature_attention_mask=torch.ones((1, 100), dtype=torch.long),
        ).logits.numpy()

    frontend = WhisperMelFrontend(CFG.mel)
    padded = frontend.pad_or_trim(wav, num_windows=1)
    mels = np.asarray(frontend(padded[None]))[None]
    params = import_qwen2_audio({k: v.numpy() for k, v in hf_model.state_dict().items()},
                                CFG)
    ours = np.asarray(af3.logits(params, CFG, jnp.asarray(ids), jnp.asarray(mels)))
    assert np.abs(ours - ref).max() < 1e-3, np.abs(ours - ref).max()
