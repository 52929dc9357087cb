"""Beam lane tests: the engines' pausable beam path (runtime/beam_lane.py) must
emit exactly what the single-shot generate_beam / generate_beam_xattn APIs emit
([hf] generation/utils.py:1090 routes num_beams>1 to _beam_search; the lane is
that mode composed with continuous-batching serving). Chunk boundaries only
partition the while_loop's iteration space, so equality is token-exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.beam import generate_beam
from audio_flamingo_tpu.runtime.beam_lane import BeamLane, BeamRequest
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 127
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1, num_heads=4,
                                 ffn_dim=64, max_source_positions=12),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    audio_token_id=120,
)


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


def _ref_beam(params, ids, *, num_beams, max_new, R=1, **kw):
    seqs, scores = generate_beam(
        params, CFG, jnp.asarray(ids), None, num_beams=num_beams,
        max_new_tokens=max_new, eos_token_id=EOS, compute_dtype=jnp.float32,
        num_return_sequences=R, **kw)
    return np.asarray(seqs)[0], np.asarray(scores)[0]


@pytest.mark.parametrize("chunk,ngram,do_sample", [
    (3, 0, False), (8, 0, False), (4, 2, False), (5, 0, True)])
def test_lane_chunked_equals_generate_beam(params, chunk, ngram, do_sample):
    """Lane advance in bounded chunks == the one-shot while_loop, including the
    n-gram history processor and Gumbel do_sample beams (rng folds by absolute
    step, so chunking preserves the stream). Prompts are bucket-padded in the
    lane (prompt_len traced) while generate_beam runs unpadded — pads must be
    invisible."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 120, (1, 7)).astype(np.int32)
    lane = BeamLane(params=params, cfg=CFG, eos_token_id=EOS, chunk=chunk,
                    compute_dtype=jnp.float32)
    lane.submit(BeamRequest(request_id="b0", ids=ids, num_beams=3,
                            max_new_tokens=10, num_return_sequences=2,
                            no_repeat_ngram_size=ngram, do_sample=do_sample,
                            temperature=0.9 if do_sample else 1.0))
    rounds = 0
    while lane.busy and rounds < 50:
        lane.step()
        rounds += 1
    assert "b0" in lane.finished
    got_seqs, got_scores = lane.finished["b0"]
    ref_seqs, ref_scores = _ref_beam(
        params, ids, num_beams=3, max_new=10, R=2,
        no_repeat_ngram_size=ngram, do_sample=do_sample,
        temperature=0.9 if do_sample else 1.0,
        rng=jax.random.PRNGKey(0) if do_sample else None)
    np.testing.assert_array_equal(got_seqs, ref_seqs)
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)


def test_engine_serves_beam_and_normal_requests(params):
    """A BatchEngine serving normal greedy requests AND a beam request: the
    normal streams match the engine-only run, the beam result matches
    generate_beam — beam traffic must not perturb slot decoding."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 120, (1, 5 + i)).astype(np.int32) for i in range(3)]
    beam_ids = rng.integers(0, 120, (1, 9)).astype(np.int32)

    def build():
        return BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                           chunk=4, eos_token_id=EOS,
                           sampling=SamplingParams(greedy=True),
                           compute_dtype=jnp.float32)

    plain = build()
    for i, p in enumerate(prompts):
        plain.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=10))
    plain_out = plain.run_until_done()

    mixed = build()
    for i, p in enumerate(prompts):
        mixed.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=10))
    mixed.submit_beam(BeamRequest(request_id="beam", ids=beam_ids, num_beams=4,
                                  max_new_tokens=8, length_penalty=1.5))
    mixed_out = mixed.run_until_done()

    assert mixed_out == plain_out
    got_seqs, got_scores = mixed.finished_beams["beam"]
    ref_seqs, ref_scores = _ref_beam(params, beam_ids, num_beams=4, max_new=8,
                                     length_penalty=1.5)
    np.testing.assert_array_equal(got_seqs, ref_seqs)
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)


def test_engine_beam_only_drains(params):
    """Beam requests alone (no slot traffic) must still drain run_until_done."""
    rng = np.random.default_rng(4)
    a = rng.integers(0, 120, (1, 6)).astype(np.int32)
    b = rng.integers(0, 120, (1, 8)).astype(np.int32)
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                         chunk=4, eos_token_id=EOS, compute_dtype=jnp.float32)
    engine.submit_beam(BeamRequest(request_id="a", ids=a, num_beams=2,
                                   max_new_tokens=6))
    engine.submit_beam(BeamRequest(request_id="b", ids=b, num_beams=3,
                                   max_new_tokens=6))
    engine.run_until_done()
    for ids, rid, K in [(a, "a", 2), (b, "b", 3)]:
        got_seqs, got_scores = engine.finished_beams[rid]
        ref_seqs, ref_scores = _ref_beam(params, ids, num_beams=K, max_new=6)
        np.testing.assert_array_equal(got_seqs, ref_seqs)
        np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)


def test_paged_engine_serves_beam(params):
    """The paged engine's beam lane (dense K-row side cache next to the page
    pool) matches generate_beam while paged requests stream normally."""
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    rng = np.random.default_rng(5)
    p0 = rng.integers(0, 120, (1, 6)).astype(np.int32)
    beam_ids = rng.integers(0, 120, (1, 7)).astype(np.int32)
    engine = PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=64,
                         block_size=16, max_blocks_per_seq=8, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    engine.submit(Request(request_id="r0", ids=p0, max_new_tokens=10))
    engine.submit_beam(BeamRequest(request_id="beam", ids=beam_ids, num_beams=3,
                                   max_new_tokens=8))
    out = engine.run_until_done()
    ref = gen.generate(params, CFG, jnp.asarray(p0), None, max_new_tokens=10,
                       eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                       capacity=128, compute_dtype=jnp.float32)
    ref_tokens = [int(t) for t in np.asarray(ref[0])[0][: int(ref[1][0])]]
    n = min(len(ref_tokens), len(out["r0"]))
    assert out["r0"][:n] == ref_tokens[:n]
    got_seqs, got_scores = engine.finished_beams["beam"]
    ref_seqs, ref_scores = _ref_beam(params, beam_ids, num_beams=3, max_new=8)
    np.testing.assert_array_equal(got_seqs, ref_seqs)
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)


def test_paged_flamingo_engine_serves_beam():
    """AF1/AF2 paged engine: beam requests ride the xattn BeamLane while paged
    xattn rows stream normally; beam result == generate_beam_xattn and the
    normal request matches the single-request flamingo.generate stream."""
    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.runtime.beam import generate_beam_xattn
    from audio_flamingo_tpu.runtime.flamingo_engine import FlamingoRequest
    from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

    cfg = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2, audio_embed_dim=16)
    fparams = flamingo.init(jax.random.PRNGKey(2), cfg)
    fparams["xattn"]["alpha_xattn"] = jnp.full_like(
        fparams["xattn"]["alpha_xattn"], 0.5)
    rng = np.random.default_rng(7)
    beam_ids = rng.integers(0, 90, (1, 6)).astype(np.int32)
    wins = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
    norm_ids = rng.integers(0, 90, (1, 5)).astype(np.int32)

    engine = PagedFlamingoEngine(params=fparams, cfg=cfg, num_rows=2,
                                 num_blocks=32, block_size=16,
                                 max_blocks_per_seq=8, chunk=4, eos_token_id=-2,
                                 sampling=SamplingParams(greedy=True),
                                 compute_dtype=jnp.float32, n_media=1,
                                 windows_per_media=4)
    engine.submit(FlamingoRequest(request_id="n0", ids=norm_ids,
                                  window_embeds=wins, max_new_tokens=6))
    engine.submit_beam(BeamRequest(request_id="beam", ids=beam_ids,
                                   window_embeds=wins, num_beams=3,
                                   max_new_tokens=6))
    out = engine.run_until_done()
    ref_tokens, ref_lens = flamingo.generate(
        fparams, cfg, jnp.asarray(norm_ids), engine._pad_windows(wins),
        max_new_tokens=6, eos_token_id=-2, sampling=SamplingParams(greedy=True),
        rng=jax.random.PRNGKey(0), capacity=128, compute_dtype=jnp.float32)
    ref_norm = [int(t) for t in np.asarray(ref_tokens)[0][: int(ref_lens[0])]]
    assert out["n0"] == ref_norm
    got_seqs, got_scores = engine.finished_beams["beam"]
    ref_seqs, ref_scores = generate_beam_xattn(
        fparams, cfg, jnp.asarray(beam_ids), engine._pad_windows(wins),
        num_beams=3, max_new_tokens=6, eos_token_id=-2,
        compute_dtype=jnp.float32)
    np.testing.assert_array_equal(got_seqs, np.asarray(ref_seqs)[0])
    np.testing.assert_allclose(got_scores, np.asarray(ref_scores)[0], atol=1e-5)


def test_flamingo_engine_serves_beam():
    """AF1/AF2 (gated-xattn) engines serve beam requests through the xattn lane;
    result == generate_beam_xattn with the engine's padded media shape."""
    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.runtime.beam import generate_beam_xattn
    from audio_flamingo_tpu.runtime.flamingo_engine import (FlamingoEngine,
                                                            FlamingoRequest)

    cfg = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2, audio_embed_dim=16)
    fparams = flamingo.init(jax.random.PRNGKey(2), cfg)
    fparams["xattn"]["alpha_xattn"] = jnp.full_like(
        fparams["xattn"]["alpha_xattn"], 0.5)
    rng = np.random.default_rng(6)
    ids = rng.integers(0, 90, (1, 6)).astype(np.int32)
    wins = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
    norm_ids = rng.integers(0, 90, (1, 5)).astype(np.int32)

    engine = FlamingoEngine(params=fparams, cfg=cfg, num_slots=2, capacity=128,
                            chunk=4, eos_token_id=-2,
                            sampling=SamplingParams(greedy=True),
                            compute_dtype=jnp.float32, n_media=1,
                            windows_per_media=4)
    engine.submit(FlamingoRequest(request_id="n0", ids=norm_ids,
                                  window_embeds=wins, max_new_tokens=6))
    engine.submit_beam(BeamRequest(request_id="beam", ids=ids,
                                   window_embeds=wins, num_beams=3,
                                   max_new_tokens=6))
    engine.run_until_done()
    got_seqs, got_scores = engine.finished_beams["beam"]
    ref_seqs, ref_scores = generate_beam_xattn(
        fparams, cfg, jnp.asarray(ids), engine._pad_windows(wins), num_beams=3,
        max_new_tokens=6, eos_token_id=-2, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(got_seqs, np.asarray(ref_seqs)[0])
    np.testing.assert_allclose(got_scores, np.asarray(ref_scores)[0], atol=1e-5)


def test_flamingo_lane_do_sample_plumbed():
    """BeamRequest.do_sample/temperature must reach the xattn lane (they were
    silently dropped): lane do_sample result == generate_beam_xattn with the
    same rng fold, and differs from the greedy lane result when sampling bites."""
    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.runtime.beam import generate_beam_xattn
    from audio_flamingo_tpu.runtime.flamingo_engine import FlamingoEngine

    cfg = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2, audio_embed_dim=16)
    fparams = flamingo.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 90, (1, 6)).astype(np.int32)
    wins = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)

    def run(do_sample):
        engine = FlamingoEngine(params=fparams, cfg=cfg, num_slots=2,
                                capacity=128, chunk=4, eos_token_id=-2,
                                sampling=SamplingParams(greedy=True),
                                compute_dtype=jnp.float32, n_media=1,
                                windows_per_media=4)
        engine.submit_beam(BeamRequest(request_id="b", ids=ids,
                                       window_embeds=wins, num_beams=3,
                                       max_new_tokens=6, do_sample=do_sample,
                                       temperature=0.9, seed=0))
        engine.run_until_done()
        return engine.finished_beams["b"]

    got_seqs, got_scores = run(do_sample=True)
    ref_seqs, ref_scores = generate_beam_xattn(
        fparams, cfg, jnp.asarray(ids), jnp.asarray(wins), num_beams=3,
        max_new_tokens=6, eos_token_id=-2, compute_dtype=jnp.float32,
        do_sample=True, temperature=0.9, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(got_seqs, np.asarray(ref_seqs)[0])
    np.testing.assert_allclose(got_scores, np.asarray(ref_scores)[0], atol=1e-5)
    greedy_seqs, _ = run(do_sample=False)
    assert not np.array_equal(got_seqs, greedy_seqs)
