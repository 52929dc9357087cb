"""End-to-end golden test: AF3 composition vs a tiny random
[hf] Qwen2AudioForConditionalGeneration (wiring-identical to AF3: encoder -> pool ->
projector -> masked_scatter over audio placeholder tokens -> Qwen2 LM).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.io.hf_import import import_qwen2_audio
from audio_flamingo_tpu.models import af3

jax.config.update("jax_default_matmul_precision", "highest")

AUDIO_TOKEN = 120
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=2, num_heads=4,
                                 ffn_dim=64, max_source_positions=12, pool_stride=2),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, rope_theta=1e6, tie_word_embeddings=False),
    audio_token_id=AUDIO_TOKEN,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFQwen2Config
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
    )
    from transformers.models.qwen2_audio.modeling_qwen2_audio import (
        Qwen2AudioForConditionalGeneration,
    )

    aud = Qwen2AudioEncoderConfig(num_mel_bins=16, d_model=32, encoder_layers=2,
                                  encoder_attention_heads=4, encoder_ffn_dim=64,
                                  max_source_positions=12)
    txt = HFQwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                        rope_theta=1e6, tie_word_embeddings=False, attention_dropout=0.0)
    cfg = Qwen2AudioConfig(audio_config=aud.to_dict(), text_config=txt.to_dict(),
                           audio_token_id=AUDIO_TOKEN)
    torch.manual_seed(0)
    return Qwen2AudioForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return import_qwen2_audio(sd, CFG)


def test_af3_logits_match_qwen2_audio(hf_model, params):
    rng = np.random.default_rng(0)
    frames = 2 * CFG.encoder.max_source_positions  # 24
    audio_tokens = CFG.encoder.max_source_positions // 2  # 6 after pooling
    mels = rng.normal(size=(1, 1, frames, 16)).astype(np.float32)

    # prompt: 3 text tokens, then the expanded audio placeholders, then 4 text tokens
    ids = np.array([[5, 6, 7] + [AUDIO_TOKEN] * audio_tokens + [9, 10, 11, 12]])

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(mels[0].transpose(0, 2, 1)),  # [1, mel, T]
            feature_attention_mask=torch.ones((1, frames), dtype=torch.long),
        ).logits.numpy()

    ours = np.asarray(af3.logits(params, CFG, jnp.asarray(ids), jnp.asarray(mels)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_af3_tiny_random_loss_and_grad():
    cfg = AF3Config.tiny()
    params = af3.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.concatenate([
        jnp.full((1, 750), cfg.audio_token_id, jnp.int32),
        jnp.arange(10, dtype=jnp.int32)[None] % cfg.lm.vocab_size,
    ], axis=1)
    labels = jnp.concatenate([jnp.full((1, 750), -100, jnp.int32),
                              jnp.arange(10, dtype=jnp.int32)[None] % cfg.lm.vocab_size], axis=1)
    mels = jnp.zeros((1, 1, 3000, cfg.encoder.num_mel_bins), jnp.float32)
    val, grads = jax.value_and_grad(af3.loss)(params, cfg, ids, labels, mels)
    assert bool(jnp.isfinite(val))
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # audio-placeholder label positions are masked: loss only over the 10 text labels
    assert val > 0


def test_scatter_orders_windows_correctly():
    """Two windows of audio tokens must land in their placeholders in order."""
    d = 4
    text = jnp.zeros((1, 6, d))
    ids = jnp.array([[1, 9, 9, 2, 9, 3]])  # 9 = audio token
    audio = jnp.stack([jnp.full((d,), 10.0), jnp.full((d,), 20.0), jnp.full((d,), 30.0)])[None]
    out = af3.scatter_audio_embeds(text, ids, audio, audio_token_id=9)
    np.testing.assert_allclose(np.asarray(out[0, 1]), 10.0)
    np.testing.assert_allclose(np.asarray(out[0, 2]), 20.0)
    np.testing.assert_allclose(np.asarray(out[0, 4]), 30.0)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)


def test_importer_llava_naming_variant(hf_model):
    """The importer must accept llava/VILA-style names (model.audio_tower, mm_projector)."""
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    renamed = {}
    for k, v in sd.items():
        if k.startswith("audio_tower."):
            renamed["model.audio_tower." + k[len("audio_tower."):]] = v
        elif k == "multi_modal_projector.linear.weight":
            renamed["model.mm_projector.0.weight"] = v
            # synthesize an identity second layer for the 2-layer variant
            import numpy as _np

            d = v.shape[0]
            renamed["model.mm_projector.2.weight"] = _np.eye(d, dtype=v.dtype)
            renamed["model.mm_projector.2.bias"] = _np.zeros(d, dtype=v.dtype)
        elif k == "multi_modal_projector.linear.bias":
            renamed["model.mm_projector.0.bias"] = v
        else:
            renamed[k] = v  # language_model.* unchanged
    params = import_qwen2_audio(renamed, CFG)
    assert "fc2" in params["adaptor"]
    # fc2 is identity+gelu'd... just check shapes and that forward runs
    ids = np.array([[5, 6, 7] + [AUDIO_TOKEN] * 6 + [9]])
    mels = np.zeros((1, 1, 24, 16), np.float32)
    out = af3.logits(params, CFG, jnp.asarray(ids), jnp.asarray(mels))
    assert bool(jnp.isfinite(out).all())
