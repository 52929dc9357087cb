"""Top-level API tests: from_random model, generate, multi-turn chat, streaming."""

import numpy as np
import pytest

import jax

from audio_flamingo_tpu.api import AudioFlamingo
from audio_flamingo_tpu.ops.sampling import SamplingParams

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def model():
    import jax.numpy as jnp

    return AudioFlamingo.from_random(compute_dtype=jnp.float32)


def test_generate_text_only(model):
    out = model.generate(prompt="Hello?", max_new_tokens=4)
    assert isinstance(out, str)


def test_generate_with_audio(model):
    wav = (0.2 * np.sin(2 * np.pi * 440 * np.arange(16000 * 2) / 16000)).astype(np.float32)
    out = model.generate(sound=wav, prompt="What is this?", max_new_tokens=4)
    assert isinstance(out, str)


def test_chat_history_accumulates(model):
    model.reset_chat()
    model.generate(prompt="first turn", max_new_tokens=3, chat=True)
    assert len(model.history) == 2
    model.generate(prompt="second turn", max_new_tokens=3, chat=True)
    assert len(model.history) == 4
    assert model.history[0]["role"] == "user"
    assert model.history[1]["role"] == "assistant"
    model.reset_chat()
    assert not model.history


def test_streaming_yields_ints(model):
    wav = np.zeros(16000, np.float32)
    toks = list(model.generate(sound=wav, prompt="stream", max_new_tokens=5, stream=True))
    assert 1 <= len(toks) <= 5
    assert all(isinstance(t, int) for t in toks)


def test_greedy_deterministic(model):
    a = model.generate(prompt="det", max_new_tokens=6, sampling=SamplingParams(greedy=True))
    b = model.generate(prompt="det", max_new_tokens=6, sampling=SamplingParams(greedy=True))
    assert a == b


def test_chat_audio_carries_across_turns(model):
    """Audio from turn 1 must stay paired with its placeholder in later turns; adding
    new audio in turn 2 must not crash on placeholder/clip count mismatch."""
    model.reset_chat()
    wav1 = (0.2 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    wav2 = (0.2 * np.sin(2 * np.pi * 880 * np.arange(16000) / 16000)).astype(np.float32)
    model.generate(sound=wav1, prompt="first clip", chat=True, max_new_tokens=3)
    out2 = model.generate(prompt="no audio now", chat=True, max_new_tokens=3)
    assert isinstance(out2, str)
    out3 = model.generate(sound=wav2, prompt="second clip", chat=True, max_new_tokens=3)
    assert isinstance(out3, str)
    # history keeps per-turn audio
    user_turns = [m for m in model.history if m["role"] == "user"]
    assert len(user_turns[0]["audios"]) == 1
    assert len(user_turns[1]["audios"]) == 0
    assert len(user_turns[2]["audios"]) == 1
    model.reset_chat()
