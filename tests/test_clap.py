"""Golden test: HTSAT/Swin CLAP audio tower vs [hf] ClapModel on a small random config."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import ClapAudioConfig
from audio_flamingo_tpu.io.hf_import import import_clap_audio
from audio_flamingo_tpu.models.clap import ClapAudioTower, bicubic_interp_matrix

jax.config.update("jax_default_matmul_precision", "highest")

# small Swin: spec 64, patch 4 -> grid 16; window 4; depths (2,2) heads (2,4)
CFG = ClapAudioConfig(num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=4,
                      patch_embed_dim=24, depths=(2, 2), num_heads=(2, 4), window_size=4,
                      projection_dim=32, enable_fusion=False)
FUSION_CFG = ClapAudioConfig(num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=4,
                             patch_embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                             window_size=4, projection_dim=32, enable_fusion=True)


def _hf_model(fusion: bool):
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig as HFAudioConfig,
        ClapConfig,
        ClapTextConfig,
    )
    from transformers.models.clap.modeling_clap import ClapModel

    aud = HFAudioConfig(num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=[4, 4],
                        patch_embeds_hidden_size=24, depths=[2, 2],
                        num_attention_heads=[2, 4], window_size=4,
                        enable_fusion=fusion, fusion_type=None,
                        num_hidden_layers=2, hidden_size=24 * 2,
                        projection_dim=32, drop_path_rate=0.0,
                        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    txt = ClapTextConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=64, projection_dim=32)
    cfg = ClapConfig(text_config=txt.to_dict(), audio_config=aud.to_dict(), projection_dim=32)
    torch.manual_seed(0)
    model = ClapModel(cfg).eval()
    # randomize batch-norm stats so eval-mode BN is actually exercised
    with torch.no_grad():
        bn = model.audio_model.audio_encoder.batch_norm
        bn.running_mean.copy_(torch.randn(16) * 0.1)
        bn.running_var.copy_(torch.rand(16) + 0.5)
    return model


def test_bicubic_matrix_matches_torch():
    x = torch.randn(1, 1, 50, 8)
    ref = torch.nn.functional.interpolate(x, (64, 8), mode="bicubic", align_corners=True)
    w = bicubic_interp_matrix(50, 64)
    ours = np.einsum("ot,bctf->bcof", w, x.numpy())
    np.testing.assert_allclose(ours, ref.numpy(), atol=3e-5)


@pytest.mark.parametrize("fusion", [False, True])
def test_clap_audio_matches_hf(fusion):
    model = _hf_model(fusion)
    cfg = FUSION_CFG if fusion else CFG
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_clap_audio(sd, cfg)
    tower = ClapAudioTower(cfg)

    rng = np.random.default_rng(0)
    c = 4 if fusion else 1
    t_frames = 200  # < spec_w = 256 -> exercises bicubic time interpolation
    mels = rng.normal(size=(2, c, t_frames, 16)).astype(np.float32)
    is_longer = np.array([[1], [0]], dtype=bool) if fusion else None

    with torch.no_grad():
        ref = model.get_audio_features(
            input_features=torch.from_numpy(mels),
            is_longer=torch.from_numpy(is_longer) if fusion else None,
        ).numpy()

    out = tower.encode(params, jnp.asarray(mels),
                       jnp.asarray(is_longer) if fusion else None)
    np.testing.assert_allclose(np.asarray(out["embeds"]), ref, atol=5e-5, rtol=1e-4)
