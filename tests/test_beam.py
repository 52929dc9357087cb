"""Beam search golden tests: runtime/beam.generate_beam vs [hf]
generate(num_beams=K, do_sample=False) — token-exact sequences AND matching
sequence scores, across beam widths, length penalties, early-stopping modes, and
the audio (qwen2_audio) path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.io.hf_import import import_qwen2_audio
from audio_flamingo_tpu.runtime.beam import generate_beam

jax.config.update("jax_default_matmul_precision", "highest")

AUDIO_TOKEN = 120
EOS = 127
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=2, num_heads=4,
                                 ffn_dim=64, max_source_positions=12, pool_stride=2),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, rope_theta=1e6,
                   tie_word_embeddings=False),
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
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, rope_theta=1e6,
                        tie_word_embeddings=False, attention_dropout=0.0,
                        eos_token_id=EOS, bos_token_id=0, pad_token_id=0)
    cfg = Qwen2AudioConfig(audio_config=aud.to_dict(), text_config=txt.to_dict(),
                           audio_token_id=AUDIO_TOKEN)
    torch.manual_seed(0)
    return Qwen2AudioForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return import_qwen2_audio(sd, CFG)


def _hf_beam(hf_model, ids, max_new, num_beams, mels=None, frames=None, **gen_kw):
    kw = {}
    if mels is not None:
        kw = dict(input_features=torch.from_numpy(mels[0].transpose(0, 2, 1)),
                  feature_attention_mask=torch.ones((1, frames), dtype=torch.long))
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.from_numpy(ids), max_new_tokens=max_new,
            do_sample=False, num_beams=num_beams, return_dict_in_generate=True,
            output_scores=True, **gen_kw, **kw)
    seq = out.sequences.numpy()[0, ids.shape[1]:]
    score = float(out.sequences_scores.numpy()[0])
    return seq, score


def _ours(params, ids, max_new, num_beams, mels=None, **kw):
    seqs, scores = generate_beam(
        params, CFG, jnp.asarray(ids),
        None if mels is None else jnp.asarray(mels),
        num_beams=num_beams, max_new_tokens=max_new, eos_token_id=EOS,
        compute_dtype=jnp.float32, **kw)
    seq = np.asarray(seqs)[0, 0]
    # trim at first EOS (HF crops its output; our pad value IS eos)
    if EOS in seq.tolist():
        seq = seq[: seq.tolist().index(EOS) + 1]
    return seq, float(scores[0, 0])


TEXT_IDS = np.array([[5, 6, 7, 9, 10, 11, 12, 3, 2, 8]], dtype=np.int64)


@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_matches_hf_text(hf_model, params, num_beams):
    ref, ref_score = _hf_beam(hf_model, TEXT_IDS, 12, num_beams)
    got, got_score = _ours(params, TEXT_IDS.astype(np.int32), 12, num_beams)
    n = min(len(ref), len(got))
    np.testing.assert_array_equal(got[:n], ref[:n])
    np.testing.assert_allclose(got_score, ref_score, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("kw_hf,kw_ours", [
    (dict(length_penalty=2.0), dict(length_penalty=2.0)),
    (dict(length_penalty=0.0), dict(length_penalty=0.0)),
    (dict(early_stopping=True), dict(early_stopping=True)),
    (dict(early_stopping="never", length_penalty=1.5),
     dict(early_stopping="never", length_penalty=1.5)),
])
def test_beam_matches_hf_modes(hf_model, params, kw_hf, kw_ours):
    ref, ref_score = _hf_beam(hf_model, TEXT_IDS, 10, 3, **kw_hf)
    got, got_score = _ours(params, TEXT_IDS.astype(np.int32), 10, 3, **kw_ours)
    n = min(len(ref), len(got))
    np.testing.assert_array_equal(got[:n], ref[:n])
    np.testing.assert_allclose(got_score, ref_score, atol=2e-4, rtol=2e-4)


def test_beam_matches_hf_audio(hf_model, params):
    rng = np.random.default_rng(3)
    frames = 24
    mels = rng.normal(size=(1, 1, frames, 16)).astype(np.float32)
    ids = np.array([[5, 6, 7] + [AUDIO_TOKEN] * 6 + [9, 10, 11, 12]])
    ref, ref_score = _hf_beam(hf_model, ids, 10, 3, mels=mels, frames=frames)
    got, got_score = _ours(params, ids.astype(np.int32), 10, 3, mels=mels)
    n = min(len(ref), len(got))
    np.testing.assert_array_equal(got[:n], ref[:n])
    np.testing.assert_allclose(got_score, ref_score, atol=2e-4, rtol=2e-4)


def test_beam_num_return_sequences(hf_model, params):
    with torch.no_grad():
        out = hf_model.generate(input_ids=torch.from_numpy(TEXT_IDS),
                                max_new_tokens=8, do_sample=False, num_beams=4,
                                num_return_sequences=3,
                                return_dict_in_generate=True, output_scores=True)
    seqs, scores = generate_beam(params, CFG, jnp.asarray(TEXT_IDS, jnp.int32),
                                 None, num_beams=4, max_new_tokens=8,
                                 eos_token_id=EOS, compute_dtype=jnp.float32,
                                 num_return_sequences=3)
    for r in range(3):
        ref = out.sequences.numpy()[r, TEXT_IDS.shape[1]:]
        got = np.asarray(seqs)[0, r]
        if EOS in got.tolist():
            got = got[: got.tolist().index(EOS) + 1]
        n = min(len(ref), len(got))
        np.testing.assert_array_equal(got[:n], ref[:n])
        np.testing.assert_allclose(float(scores[0, r]),
                                   float(out.sequences_scores.numpy()[r]),
                                   atol=2e-4, rtol=2e-4)


def test_beam_batched_matches_single(params):
    """B=2 batched beam search == two independent B=1 runs (bookkeeping is
    per-batch-row)."""
    rng = np.random.default_rng(7)
    a = rng.integers(0, 120, (1, 9)).astype(np.int32)
    b = rng.integers(0, 120, (1, 9)).astype(np.int32)
    both = np.concatenate([a, b], axis=0)
    seqs2, scores2 = generate_beam(params, CFG, jnp.asarray(both), None,
                                   num_beams=3, max_new_tokens=8, eos_token_id=EOS,
                                   compute_dtype=jnp.float32)
    for r, ids in enumerate([a, b]):
        seq1, score1 = generate_beam(params, CFG, jnp.asarray(ids), None,
                                     num_beams=3, max_new_tokens=8, eos_token_id=EOS,
                                     compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(seqs2)[r, 0],
                                      np.asarray(seq1)[0, 0])
        np.testing.assert_allclose(float(scores2[r, 0]), float(score1[0, 0]),
                                   atol=1e-5)


def test_beam_xattn_beam1_matches_greedy():
    """AF1/AF2 beam search: K=1 == the flamingo greedy path; K=4 scores are
    teacher-forced-consistent (sum of per-token logprobs / len**penalty)."""
    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.runtime.beam import generate_beam_xattn

    cfg = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2, audio_embed_dim=16)
    params = flamingo.init(jax.random.PRNGKey(2), cfg)
    params["xattn"]["alpha_xattn"] = jnp.full_like(params["xattn"]["alpha_xattn"], 0.5)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 90, (1, 6)), jnp.int32)
    wins = jnp.asarray(rng.normal(size=(1, 1, 4, 16)), jnp.float32)

    greedy_toks, greedy_lens = flamingo.generate(params, cfg, ids, wins,
                                                 max_new_tokens=8, eos_token_id=-2)
    g = np.asarray(greedy_toks)[0][: int(greedy_lens[0])].tolist()
    seqs, scores = generate_beam_xattn(params, cfg, ids, wins, num_beams=1,
                                       max_new_tokens=8, eos_token_id=-2)
    b1 = np.asarray(seqs)[0, 0].tolist()
    assert b1[: len(g)] == g[: len(b1)]

    # K=4: best score must equal the teacher-forced logprob sum / length
    seqs4, scores4 = generate_beam_xattn(params, cfg, ids, wins, num_beams=4,
                                         max_new_tokens=6, eos_token_id=-2)
    best = np.asarray(seqs4)[0, 0].tolist()
    full = jnp.concatenate([ids, jnp.asarray([best], jnp.int32)], axis=1)
    lg = flamingo.logits(params, cfg, full, wins)
    lp = jax.nn.log_softmax(lg[0].astype(jnp.float32), axis=-1)
    t0 = ids.shape[1]
    want = sum(float(lp[t0 - 1 + i, tok]) for i, tok in enumerate(best)) / len(best)
    np.testing.assert_allclose(float(scores4[0, 0]), want, atol=2e-4, rtol=2e-4)


def test_no_repeat_ngram_matches_hf_greedy_and_beam(hf_model, params):
    """no_repeat_ngram_size: token-exact vs HF for greedy AND beam search."""
    import jax as _jax
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime import generate as gen

    ids = TEXT_IDS
    for n in (2, 3):
        with torch.no_grad():
            ref = hf_model.generate(input_ids=torch.from_numpy(ids),
                                    max_new_tokens=12, do_sample=False,
                                    no_repeat_ngram_size=n).numpy()[0, ids.shape[1]:]
        toks, lens = gen.generate(
            params, CFG, jnp.asarray(ids, jnp.int32), None, max_new_tokens=12,
            eos_token_id=EOS, compute_dtype=jnp.float32,
            sampling=SamplingParams(greedy=True, no_repeat_ngram_size=n))
        got = np.asarray(toks)[0][: int(lens[0])]
        m = min(len(ref), len(got))
        np.testing.assert_array_equal(got[:m], ref[:m])

        ref_b, ref_score = _hf_beam(hf_model, ids, 10, 3, no_repeat_ngram_size=n)
        got_b, got_score = _ours(params, ids.astype(np.int32), 10, 3,
                                 no_repeat_ngram_size=n)
        m = min(len(ref_b), len(got_b))
        np.testing.assert_array_equal(got_b[:m], ref_b[:m])
        np.testing.assert_allclose(got_score, ref_score, atol=2e-4, rtol=2e-4)


def test_beam_sample_properties(params):
    """do_sample beams ([hf] beam_sample, Gumbel-top-k == multinomial without
    replacement): near-zero temperature reduces to deterministic beam search;
    hot sampling is seeded-deterministic and varies across seeds."""
    ids = jnp.asarray(TEXT_IDS, jnp.int32)
    det, _ = generate_beam(params, CFG, ids, None, num_beams=3, max_new_tokens=8,
                           eos_token_id=EOS, compute_dtype=jnp.float32)
    cold, _ = generate_beam(params, CFG, ids, None, num_beams=3, max_new_tokens=8,
                            eos_token_id=EOS, compute_dtype=jnp.float32,
                            do_sample=True, temperature=1e-4,
                            rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(det)[0, 0], np.asarray(cold)[0, 0])
    outs = []
    for seed in (1, 2):
        s1, _ = generate_beam(params, CFG, ids, None, num_beams=3, max_new_tokens=8,
                              eos_token_id=EOS, compute_dtype=jnp.float32,
                              do_sample=True, temperature=1.5,
                              rng=jax.random.PRNGKey(seed))
        s2, _ = generate_beam(params, CFG, ids, None, num_beams=3, max_new_tokens=8,
                              eos_token_id=EOS, compute_dtype=jnp.float32,
                              do_sample=True, temperature=1.5,
                              rng=jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        outs.append(np.asarray(s1)[0, 0].tolist())
    assert outs[0] != outs[1]
    assert all(0 <= t < CFG.lm.vocab_size for t in outs[0])
