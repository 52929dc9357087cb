"""AF2 end-to-end pipeline tests: CLAP windowing, processor, wav -> answer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def model():
    from audio_flamingo_tpu.api import AudioFlamingo2
    from audio_flamingo_tpu.config import ClapAudioConfig

    # small HTSAT for test speed
    clap_cfg = ClapAudioConfig(num_mel_bins=64, spec_size=64, patch_size=4, patch_stride=4,
                               patch_embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                               window_size=4, projection_dim=512, enable_fusion=True)
    return AudioFlamingo2.from_random(clap_cfg=clap_cfg)


def test_clap_window_chunking(model):
    wav = np.zeros(48_000 * 23, np.float32)  # 23 s -> 3 windows -> bucket 4
    mels, longer = model.processor.windows_for(wav)
    assert mels.shape[0] == 4
    assert mels.shape[1] == 4  # fusion channels
    assert longer.shape == (4,)


def test_af2_generate_short_clip(model):
    wav = (0.2 * np.sin(2 * np.pi * 440 * np.arange(48_000 * 2) / 48_000)).astype(np.float32)
    out = model.generate(sound=wav, prompt="What is this?", max_new_tokens=4)
    assert isinstance(out, str)


def test_af2_generate_long_clip_multiwindow(model):
    wav = np.random.default_rng(0).normal(size=48_000 * 15).astype(np.float32) * 0.1
    out = model.generate(sound=wav, prompt="Describe.", max_new_tokens=4)
    assert isinstance(out, str)


def test_af2_chat(model):
    model.reset_chat()
    model.generate(prompt="hello", max_new_tokens=3, chat=True)
    assert len(model.history) == 2


def test_media_idx_ordinals(model):
    from audio_flamingo_tpu.runtime.clap_processor import AUDIO_TOKEN

    batch = model.processor(
        text=f"a {AUDIO_TOKEN} b {AUDIO_TOKEN} c",
        audios=[np.zeros(48_000, np.float32), np.zeros(48_000, np.float32)])
    idx = batch["media_idx"][0]
    assert idx.min() == 0 and idx.max() == 2
    assert batch["mels"].shape[0] == 2


def test_af2_save_load_roundtrip(tmp_path, model):
    from audio_flamingo_tpu.api import load_af2, save_af2
    from audio_flamingo_tpu.ops.sampling import SamplingParams

    wav = (0.2 * np.sin(2 * np.pi * 440 * np.arange(48_000) / 48_000)).astype(np.float32)
    ref = model.generate(sound=wav, prompt="What?", max_new_tokens=5,
                         sampling=SamplingParams(greedy=True))
    save_af2(str(tmp_path), model)
    again = load_af2(str(tmp_path), compute_dtype=jnp.float32)
    got = again.generate(sound=wav, prompt="What?", max_new_tokens=5,
                         sampling=SamplingParams(greedy=True))
    assert got == ref


def test_af2_chat_audio_carries_across_turns(model):
    model.reset_chat()
    wav = (0.2 * np.sin(2 * np.pi * 440 * np.arange(48_000) / 48_000)).astype(np.float32)
    model.generate(sound=wav, prompt="clip one", chat=True, max_new_tokens=3)
    out2 = model.generate(prompt="text only turn", chat=True, max_new_tokens=3)
    assert isinstance(out2, str)
    out3 = model.generate(sound=wav, prompt="clip two", chat=True, max_new_tokens=3)
    assert isinstance(out3, str)
    model.reset_chat()


def test_windows_for_batched_equals_per_window_frontend(model):
    """windows_for's single batched _db_mel call must equal running the
    frontend on each window independently (the pre-round-4 host loop)."""
    rng = np.random.default_rng(3)
    wav = (rng.normal(size=int(48_000 * 17.5)) * 0.1).astype(np.float32)
    mels, longer = model.processor.windows_for(wav)

    fe = model.processor.frontend
    max_s = fe.max_samples
    n = mels.shape[0]
    for i in range(n):
        chunk = wav[i * max_s: (i + 1) * max_s]
        if len(chunk) == 0:
            chunk = np.zeros(max_s, np.float32)
        ref, is_longer = fe(chunk)
        assert not is_longer and not longer[i]
        np.testing.assert_allclose(mels[i], np.asarray(ref), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("padding", ["repeatpad", "repeat", "pad"])
@pytest.mark.parametrize("seconds", [17.5, 20.0, 7.0, 33.3])
def test_windows_for_device_equals_host(model, padding, seconds):
    """windows_for_device (one wav upload, mels stay on device — the AF2 TTFT
    device-resident chain) must match the host windows_for numerically, for
    every _pad_short tiling mode and tail shape (partial tail, exact-multiple
    tail, single short window, partial past a bucket boundary)."""
    import dataclasses

    from audio_flamingo_tpu.runtime.clap_processor import AF2Processor

    cfg = dataclasses.replace(model.cfg, mel=dataclasses.replace(
        model.cfg.mel, padding=padding))
    proc = AF2Processor(tokenizer=None, cfg=cfg)
    rng = np.random.default_rng(int(seconds * 10))
    wav = (rng.normal(size=int(48_000 * seconds)) * 0.1).astype(np.float32)

    host_mels, host_longer = proc.windows_for(wav)
    dev_mels, dev_longer = proc.windows_for_device(wav)
    assert dev_mels.shape == host_mels.shape
    np.testing.assert_array_equal(np.asarray(dev_longer), host_longer)
    np.testing.assert_allclose(np.asarray(dev_mels), host_mels,
                               rtol=1e-5, atol=1e-4)


def test_windows_for_device_int16_pcm(model):
    """int16 PCM input (WAV native; half the upload bytes) must equal the host
    path on the dequantized f32 waveform."""
    rng = np.random.default_rng(11)
    wav16 = (rng.normal(size=int(48_000 * 12.3)) * 4000).astype(np.int16)
    host_mels, _ = model.processor.windows_for(
        wav16.astype(np.float32) / 32768.0)
    dev_mels, _ = model.processor.windows_for_device(wav16)
    np.testing.assert_allclose(np.asarray(dev_mels), host_mels,
                               rtol=1e-5, atol=1e-4)
