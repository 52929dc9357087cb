"""Golden tests: Qwen2 decoder vs [hf] Qwen2ForCausalLM on a small random config,
plus prefill/decode cache-consistency tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import Qwen2Config
from audio_flamingo_tpu.io.hf_import import import_qwen2
from audio_flamingo_tpu.models import qwen2

jax.config.update("jax_default_matmul_precision", "highest")

CFG = Qwen2Config(vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
                  num_heads=4, num_kv_heads=2, rope_theta=1e6, tie_word_embeddings=False)


@pytest.fixture(scope="module")
def hf_model():
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFConfig
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rope_theta=1e6,
        tie_word_embeddings=False, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    return Qwen2ForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return import_qwen2(sd, CFG)


def test_logits_match_hf(hf_model, params):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 11))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(qwen2.logits_from_ids(params, CFG, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_prefill_then_decode_matches_full_forward(params):
    """Cache path: prefill T tokens then decode one-by-one == full no-cache forward."""
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 10)))
    full = qwen2.logits_from_ids(params, CFG, ids)

    cache = qwen2.init_cache(CFG, batch=1, capacity=16, dtype=jnp.float32)
    # prefill first 6
    x = qwen2.embed(params, ids[:, :6])
    pos = jnp.arange(6)[None]
    h, cache = qwen2.forward(params, CFG, x, pos, cache=cache)
    np.testing.assert_allclose(
        np.asarray(qwen2.unembed(params, CFG, h)), np.asarray(full[:, :6]), atol=1e-4, rtol=1e-4
    )
    # decode 4 steps
    for t in range(6, 10):
        x = qwen2.embed(params, ids[:, t: t + 1])
        h, cache = qwen2.forward(params, CFG, x, jnp.array([[t]]), cache=cache)
        step = qwen2.unembed(params, CFG, h)
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]), atol=1e-4, rtol=1e-4
        )
    assert int(cache.index) == 10


def test_tied_embeddings():
    cfg = Qwen2Config(vocab_size=64, hidden_size=16, intermediate_size=32, num_layers=1,
                      num_heads=2, num_kv_heads=1, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    assert "lm_head" not in params
    out = qwen2.logits_from_ids(params, cfg, jnp.zeros((1, 3), jnp.int32))
    assert out.shape == (1, 3, 64)


def test_flash_prefill_matches_reference(params):
    """cfg.use_flash prefill (pallas, interpret on CPU) == XLA attention logits."""
    import dataclasses
    from unittest import mock
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 24)))
    ref = qwen2.logits_from_ids(params, CFG, ids)
    cfg_flash = dataclasses.replace(CFG, use_flash=True)

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        out = qwen2.logits_from_ids(params, cfg_flash, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_sliding_window_attention():
    """With window W, token t attends only positions (t-W, t]; cache decode == full
    forward under the same window."""
    import dataclasses

    cfg = dataclasses.replace(CFG, sliding_window=4, use_flash=False)
    params = qwen2.init(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 128, (1, 12)))
    full = qwen2.logits_from_ids(params, cfg, ids)

    # equivalence: token 11 with window 4 must ignore tokens 0..7 -> changing token 0
    # must NOT change logits at position 11, but MUST change position 3
    ids2 = ids.at[0, 0].set((int(ids[0, 0]) + 1) % 128)
    full2 = qwen2.logits_from_ids(params, cfg, ids2)
    np.testing.assert_allclose(np.asarray(full[0, 11]), np.asarray(full2[0, 11]),
                               atol=1e-5)
    assert np.abs(np.asarray(full[0, 3]) - np.asarray(full2[0, 3])).max() > 1e-4

    # cache decode consistency under sliding window
    cache = qwen2.init_cache(cfg, 1, 16, dtype=jnp.float32)
    x = qwen2.embed(params, ids[:, :8])
    h, cache = qwen2.forward(params, cfg, x, jnp.arange(8)[None], cache=cache)
    np.testing.assert_allclose(np.asarray(qwen2.unembed(params, cfg, h)),
                               np.asarray(full[:, :8]), atol=1e-4, rtol=1e-4)
    for t in range(8, 12):
        x = qwen2.embed(params, ids[:, t: t + 1])
        h, cache = qwen2.forward(params, cfg, x, jnp.array([[t]]), cache=cache)
        np.testing.assert_allclose(np.asarray(qwen2.unembed(params, cfg, h)[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-4, rtol=1e-4)


def test_sliding_window_per_layer_gating_matches_hf():
    """HF gates the window PER LAYER: layer i slides iff i >= max_window_layers
    ([hf] configuration_qwen2.py:204-207). Golden logits vs HF with a mixed stack
    (layer 0 full attention, layer 1 sliding)."""
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFConfig
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM
    import dataclasses

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rope_theta=1e6,
        tie_word_embeddings=False, attention_dropout=0.0,
        use_sliding_window=True, sliding_window=4, max_window_layers=1,
    )
    assert hf_cfg.layer_types == ["full_attention", "sliding_attention"]
    torch.manual_seed(3)
    hf = Qwen2ForCausalLM(hf_cfg).eval()

    cfg = dataclasses.replace(CFG, sliding_window=4, max_window_layers=1)
    params = import_qwen2({k: v.numpy() for k, v in hf.state_dict().items()}, cfg)

    rng = np.random.default_rng(11)
    ids = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(qwen2.logits_from_ids(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)

    # and cache decode consistency with the mixed stack
    full = qwen2.logits_from_ids(params, cfg, jnp.asarray(ids[:1]))
    cache = qwen2.init_cache(cfg, 1, 16, dtype=jnp.float32)
    x = qwen2.embed(params, jnp.asarray(ids[:1, :8]))
    h, cache = qwen2.forward(params, cfg, x, jnp.arange(8)[None], cache=cache)
    np.testing.assert_allclose(np.asarray(qwen2.unembed(params, cfg, h)),
                               np.asarray(full[:, :8]), atol=1e-4, rtol=1e-4)
    for t in range(8, 12):
        x = qwen2.embed(params, jnp.asarray(ids[:1, t: t + 1]))
        h, cache = qwen2.forward(params, cfg, x, jnp.array([[t]]), cache=cache)
        np.testing.assert_allclose(np.asarray(qwen2.unembed(params, cfg, h)[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-4, rtol=1e-4)


def test_flash_with_extra_mask_falls_back(params):
    """use_flash must NOT silently drop extra_mask (padding/media masks): flash is
    bypassed whenever extra_mask is given, so results equal the XLA-mask path."""
    import dataclasses
    from unittest import mock
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 16)))
    x = qwen2.embed(params, ids)
    pos = jnp.arange(16)[None]
    # mask off positions 4..8 as if they were padding
    extra = jnp.ones((1, 1, 16, 16), bool).at[:, :, :, 4:8].set(False)

    cfg_flash = dataclasses.replace(CFG, use_flash=True)
    ref, _ = qwen2.forward(params, CFG, x, pos, extra_mask=extra)

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        out, _ = qwen2.forward(params, cfg_flash, x, pos, extra_mask=extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)
