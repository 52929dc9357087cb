"""Golden test: CLAP text tower vs [hf] ClapModel.get_text_features + contrastive loss."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.io.hf_import import import_clap_text
from audio_flamingo_tpu.models import clap_text

jax.config.update("jax_default_matmul_precision", "highest")

CFG = clap_text.ClapTextConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                               intermediate_size=64, max_position_embeddings=40,
                               projection_dim=16)


@pytest.fixture(scope="module")
def hf_model():
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig as HFAudioCfg,
        ClapConfig,
        ClapTextConfig as HFTextCfg,
    )
    from transformers.models.clap.modeling_clap import ClapModel

    txt = HFTextCfg(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=40, projection_dim=16,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    aud = HFAudioCfg(num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=[4, 4],
                     patch_embeds_hidden_size=16, depths=[1, 1], num_attention_heads=[2, 2],
                     window_size=4, projection_dim=16)
    torch.manual_seed(0)
    return ClapModel(ClapConfig(text_config=txt.to_dict(), audio_config=aud.to_dict(),
                                projection_dim=16)).eval()


def test_text_features_match_hf(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = import_clap_text(sd, CFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 100, size=(2, 9)).astype(np.int64)
    ids[1, 6:] = 1  # pad
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        ref = hf_model.get_text_features(input_ids=torch.from_numpy(ids),
                                         attention_mask=torch.from_numpy(mask)).numpy()
    out = clap_text.encode(params, CFG, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out["embeds"]), ref, atol=3e-5, rtol=1e-4)


def test_contrastive_loss_matches_hf_form(hf_model):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 16))
    t = rng.normal(size=(4, 16))
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    scale_a = float(hf_model.logit_scale_a.detach())
    scale_t = float(hf_model.logit_scale_t.detach())

    ours = float(clap_text.contrastive_loss(jnp.asarray(a), jnp.asarray(t),
                                            jnp.asarray(scale_a), jnp.asarray(scale_t)))
    # HF form: caption_loss on logits_per_text + audio_loss on its transpose
    from transformers.models.clap.modeling_clap import contrastive_loss as hf_cl

    lt = torch.from_numpy(t @ a.T * np.exp(scale_t))
    la = torch.from_numpy(a @ t.T * np.exp(scale_a))
    ref = 0.5 * (hf_cl(lt) + hf_cl(la))
    np.testing.assert_allclose(ours, float(ref), atol=1e-5)


def test_contrastive_training_aligns_pairs():
    """A few gradient steps on matched pairs should raise diagonal similarity."""
    import optax

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 16)) * 0.1, jnp.float32)

    def loss_fn(w):
        t = a @ w
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        return clap_text.contrastive_loss(an, t, jnp.asarray(2.0), jnp.asarray(2.0))

    opt = optax.adam(1e-2)
    st = opt.init(w)
    l0 = float(loss_fn(w))
    for _ in range(30):
        g = jax.grad(loss_fn)(w)
        up, st = opt.update(g, st)
        w = optax.apply_updates(w, up)
    assert float(loss_fn(w)) < l0 * 0.5
