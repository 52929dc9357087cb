"""Training pipeline tests: mixture sampling, batch packing, loss decreases over steps,
stage freeze masks, orbax checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.runtime.processor import AF3Processor, AUDIO_TOKEN
from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer, train_bpe
from audio_flamingo_tpu.train.data import BatchBuilder, MixtureSampler, Source, batches
from audio_flamingo_tpu.train.stages import AF3_STAGES, trainable_mask
from audio_flamingo_tpu.train.train_step import init_state, make_jit_train_step

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def setup():
    import dataclasses

    vocab, merges = train_bpe(["a dog barks", "music plays loudly", "someone speaks"], 380)
    tok = BBPETokenizer(vocab, merges)
    cfg0 = AF3Config.tiny()
    # shrink encoder positions for fast tests? keep 1500 (3000-frame contract)
    cfg = dataclasses.replace(cfg0, lm=dataclasses.replace(cfg0.lm, vocab_size=512),
                              audio_token_id=tok.special_tokens[AUDIO_TOKEN])
    proc = AF3Processor(tokenizer=tok, cfg=cfg)
    params = af3.init(jax.random.PRNGKey(0), cfg)

    def example(rng):
        wav = (rng.normal(size=16000) * 0.1).astype(np.float32)
        return [wav], f"What is {AUDIO_TOKEN}?", "a dog barks"

    sampler = MixtureSampler([Source("synthetic", 1.0, example)], seed=0)
    builder = BatchBuilder(processor=proc, pad_id=0)
    return cfg, params, sampler, builder


def test_batch_shapes_and_labels(setup):
    cfg, params, sampler, builder = setup
    batch = next(batches(sampler, builder, batch_size=2))
    assert batch["ids"].shape[0] == 2
    assert batch["mels"].shape[1:] == (1, 3000, cfg.encoder.num_mel_bins)
    # audio + prompt positions masked
    n_audio = (batch["ids"] == cfg.audio_token_id).sum(axis=1)
    assert (n_audio == 750).all()
    assert ((batch["labels"] == -100) | (batch["labels"] >= 0)).all()
    # answer tokens present and unmasked
    assert (batch["labels"] >= 0).sum() > 0


def test_mixture_weights():
    a = Source("a", 3.0, lambda rng: ([], "a", "x"))
    b = Source("b", 1.0, lambda rng: ([], "b", "y"))
    sampler = MixtureSampler([a, b], seed=0)
    names = [sampler.sample()[0] for _ in range(400)]
    frac = names.count("a") / len(names)
    assert 0.65 < frac < 0.85


@pytest.mark.full
def test_loss_decreases_and_freeze_mask(setup):
    cfg, params, sampler, builder = setup
    stage = AF3_STAGES["1_pretrain"]  # only adaptor trains
    params = jax.tree.map(jnp.copy, params)  # train_step donates the state
    state, opt = init_state(params, stage, warmup_steps=1, total_steps=30)
    step_fn = make_jit_train_step(cfg, opt, compute_dtype=jnp.float32)
    batch = next(batches(sampler, builder, batch_size=2))
    enc_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["encoder"])
    lm_before = np.asarray(state.params["lm"]["embed"]).copy()
    adaptor_before = np.asarray(state.params["adaptor"]["fc1"]["w"]).copy()

    losses = []
    for _ in range(8):
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # frozen submodules unchanged; adaptor moved
    np.testing.assert_array_equal(np.asarray(state.params["lm"]["embed"]), lm_before)
    np.testing.assert_array_equal(np.asarray(state.params["encoder"]["conv1_w"]),
                                  np.asarray(enc_before["conv1_w"]))
    assert np.abs(np.asarray(state.params["adaptor"]["fc1"]["w"]) - adaptor_before).max() > 0


def test_trainable_mask_stages(setup):
    cfg, params, *_ = setup
    m1 = trainable_mask(params, AF3_STAGES["1_pretrain"])
    assert not jax.tree.leaves(m1["encoder"])[0]
    assert jax.tree.leaves(m1["adaptor"])[0]
    assert not jax.tree.leaves(m1["lm"])[0]
    m3 = trainable_mask(params, AF3_STAGES["3_full_ft"])
    assert all(jax.tree.leaves(m3))


def test_checkpoint_roundtrip(tmp_path, setup):
    from audio_flamingo_tpu.train import checkpoints

    cfg, params, sampler, builder = setup
    stage = AF3_STAGES["3_full_ft"]
    state, opt = init_state(jax.tree.map(jnp.copy, params), stage)
    checkpoints.save(str(tmp_path), state, step=7)
    assert checkpoints.latest_step(str(tmp_path)) == 7
    zero_state = jax.tree.map(jnp.zeros_like, state)
    restored = checkpoints.restore(str(tmp_path), zero_state, step=7)
    np.testing.assert_array_equal(np.asarray(restored.params["lm"]["embed"]),
                                  np.asarray(state.params["lm"]["embed"]))
    assert int(restored.step) == int(state.step)


def test_safetensors_param_roundtrip(tmp_path, setup):
    from audio_flamingo_tpu.train.checkpoints import export_safetensors, import_safetensors

    cfg, params, *_ = setup
    p = str(tmp_path / "params.safetensors")
    export_safetensors(p, params)
    loaded = import_safetensors(p, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mf_stages_masks(setup):
    from audio_flamingo_tpu.train.stages import MF_STAGES

    cfg, params, *_ = setup
    m = trainable_mask(params, MF_STAGES["mf_3_grpo"])
    assert not jax.tree.leaves(m["encoder"])[0]
    assert not jax.tree.leaves(m["adaptor"])[0]
    assert jax.tree.leaves(m["lm"])[0]


def test_async_checkpointer(tmp_path, setup):
    from audio_flamingo_tpu.train import checkpoints
    from audio_flamingo_tpu.train.checkpoints import AsyncCheckpointer

    cfg, params, *_ = setup
    state, _ = init_state(jax.tree.map(jnp.copy, params), AF3_STAGES["3_full_ft"])
    ck = AsyncCheckpointer()
    ck.save(str(tmp_path), state, step=3)
    ck.close()
    restored = checkpoints.restore(str(tmp_path), jax.tree.map(jnp.zeros_like, state), step=3)
    np.testing.assert_array_equal(np.asarray(restored.params["lm"]["embed"]),
                                  np.asarray(state.params["lm"]["embed"]))


def test_tts_training_loss_decreases():
    import optax

    from audio_flamingo_tpu.models import tts

    cfg = tts.TTSConfig(vocab_size=64, d_model=32, num_layers=1, num_heads=4, ffn_dim=64,
                        n_mels=8, chunk_tokens=4, frames_per_chunk=8, state_frames=2)
    params = tts.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (2, 4)))
    prev = jnp.zeros((2, 2, 8))
    target = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)

    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: tts.loss(p, cfg, ids, prev, target)))
    losses = []
    for _ in range(20):
        l, g = grad_fn(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_spec_augment_masks_cells():
    from audio_flamingo_tpu.audio.augment import spec_augment

    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.normal(size=(2, 100, 32)) + 5.0, jnp.float32)
    out = spec_augment(jax.random.PRNGKey(0), mels, num_time_masks=2, max_time_frac=0.2,
                       num_freq_masks=2, max_freq_bins=8)
    assert out.shape == mels.shape
    changed = np.asarray(out != mels)
    assert changed.any()
    # masked cells take the per-example mean
    fill = np.asarray(mels.mean(axis=(-2, -1)))
    idx = np.argwhere(changed)
    b, t, f = idx[0]
    np.testing.assert_allclose(np.asarray(out)[b, t, f], fill[b], rtol=1e-5)


def test_audio_noise_and_gain():
    from audio_flamingo_tpu.audio.augment import add_noise_snr, random_gain

    wav = jnp.asarray(np.sin(np.linspace(0, 100, 16000)), jnp.float32)
    noisy = add_noise_snr(jax.random.PRNGKey(0), wav, snr_db=10.0)
    noise = np.asarray(noisy - wav)
    snr = 10 * np.log10(float((wav ** 2).mean()) / noise.var())
    assert 8.0 < snr < 12.0
    g = random_gain(jax.random.PRNGKey(1), wav)
    assert g.shape == wav.shape


def test_prefetch_matches_sequential(setup):
    from audio_flamingo_tpu.train.data import prefetch

    cfg, params, sampler, builder = setup
    import itertools

    seq = [b["ids"].sum() for b in itertools.islice(batches(sampler, builder, 1), 3)]
    # fresh sampler with same seed for determinism
    from audio_flamingo_tpu.train.data import MixtureSampler

    sampler2 = MixtureSampler(sampler.sources, seed=0)
    pre = [b["ids"].sum() for b in itertools.islice(
        prefetch(batches(sampler2, builder, 1)), 3)]
    assert seq == pre


def test_grain_pipeline_matches_builder(setup):
    """grain-backed stream produces valid batches and is deterministic per seed."""
    from audio_flamingo_tpu.train.grain_pipeline import grain_batches

    cfg, params, sampler, builder = setup
    it1 = grain_batches(sampler, builder, batch_size=2, seed=5)
    b1 = next(it1)
    it2 = grain_batches(sampler, builder, batch_size=2, seed=5)
    b2 = next(it2)
    np.testing.assert_array_equal(b1["ids"], b2["ids"])
    np.testing.assert_array_equal(b1["mels"], b2["mels"])
    assert (b1["ids"] == cfg.audio_token_id).sum() > 0
