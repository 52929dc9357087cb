"""Engine-side repetition penalty + n-gram blocking (VERDICT round-2 Next #6).

The serving engines maintain a device-resident per-row prompt+generated history
buffer across chunk boundaries; per-row processors must equal both (a) the scalar
warpers row-by-row and (b) the single-request `generate()` stream token-for-token —
for the slot engine, the paged engine, and the AF1/AF2 xattn engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import (AF2Config, AF3Config, ClapAudioConfig,
                                       GatedXAttnConfig, Qwen2Config,
                                       WhisperEncoderConfig)
from audio_flamingo_tpu.models import af3, flamingo
from audio_flamingo_tpu.ops.sampling import (SamplingParams,
                                             apply_no_repeat_ngram,
                                             apply_no_repeat_ngram_rows,
                                             apply_repetition_penalty,
                                             apply_repetition_penalty_rows)
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

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


# ---------------------------------------------------------------- op-level rows


def test_penalty_rows_matches_scalar():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 50)), jnp.float32)
    hist = jnp.asarray(rng.integers(-1, 50, size=(3, 12)), jnp.int32)
    pens = [1.0, 1.3, 0.7]
    got = apply_repetition_penalty_rows(logits, hist,
                                        jnp.asarray(pens, jnp.float32))
    for b, p in enumerate(pens):
        ref = apply_repetition_penalty(logits[b:b + 1], hist[b:b + 1], p, 50)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref[0]), rtol=1e-6)


def test_ngram_rows_matches_scalar_per_row():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(3, 30)), jnp.float32)
    hist = jnp.asarray(rng.integers(0, 6, size=(3, 16)), jnp.int32)  # many repeats
    lengths = jnp.asarray([16, 9, 4], jnp.int32)
    got = apply_no_repeat_ngram_rows(logits, hist, lengths, 3)
    for b in range(3):
        ref = apply_no_repeat_ngram(logits[b:b + 1], hist[b:b + 1],
                                    lengths[b], 3)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref[0]), rtol=1e-6)


def test_ngram_rows_enable_mask():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(2, 30)), jnp.float32)
    hist = jnp.asarray(rng.integers(0, 4, size=(2, 16)), jnp.int32)
    lengths = jnp.asarray([16, 16], jnp.int32)
    got = apply_no_repeat_ngram_rows(logits, hist, lengths, 3,
                                     enable=jnp.asarray([True, False]))
    ref0 = apply_no_repeat_ngram(logits[0:1], hist[0:1], lengths[0], 3)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref0[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(logits[1]))


# ------------------------------------------------------------- engine equality


def _reference(params, ids, max_new, sampling):
    tokens, lengths = gen.generate(params, CFG, jnp.asarray(ids), None,
                                   max_new_tokens=max_new, eos_token_id=EOS,
                                   sampling=sampling, capacity=256,
                                   compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


def _check_engine(engine_factory, sampling_by_req, max_new=14):
    """Submit one request per sampling params; each stream must equal its
    single-request generate()."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 100, size=(1, 5 + 2 * i)).astype(np.int32)
               for i in range(len(sampling_by_req))]
    engine = engine_factory()
    for i, (p, s) in enumerate(zip(prompts, sampling_by_req)):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=max_new,
                              sampling=s))
    results = engine.run_until_done()
    for i, (p, s) in enumerate(zip(prompts, sampling_by_req)):
        ref = _reference(engine.params, p, max_new, s)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_slot_engine_repetition_penalty(params):
    def make():
        return BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                           chunk=4, eos_token_id=EOS,
                           sampling=SamplingParams(greedy=True),
                           compute_dtype=jnp.float32)

    _check_engine(make, [SamplingParams(greedy=True, repetition_penalty=1.3),
                         SamplingParams(greedy=True, repetition_penalty=0.8),
                         SamplingParams(greedy=True)])  # mixed: one row has no warper


def test_slot_engine_no_repeat_ngram(params):
    def make():
        return BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                           chunk=4, eos_token_id=EOS,
                           sampling=SamplingParams(greedy=True),
                           compute_dtype=jnp.float32)

    _check_engine(make, [SamplingParams(greedy=True, no_repeat_ngram_size=2),
                         SamplingParams(greedy=True)])


def test_slot_engine_penalty_plus_ngram(params):
    def make():
        return BatchEngine(params=params, cfg=CFG, num_slots=3, capacity=256,
                           chunk=5, eos_token_id=EOS,
                           sampling=SamplingParams(greedy=True),
                           compute_dtype=jnp.float32)

    _check_engine(make, [
        SamplingParams(greedy=True, repetition_penalty=1.3, no_repeat_ngram_size=2),
        SamplingParams(greedy=True, no_repeat_ngram_size=3),
        SamplingParams(greedy=True, repetition_penalty=1.5),
    ])


def test_paged_engine_penalty_and_ngram(params):
    def make():
        return PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=24,
                           block_size=32, max_blocks_per_seq=8, chunk=4,
                           eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                           compute_dtype=jnp.float32)

    _check_engine(make, [SamplingParams(greedy=True, repetition_penalty=1.3),
                         SamplingParams(greedy=True, no_repeat_ngram_size=2),
                         SamplingParams(greedy=True)])


def test_engine_logprobs_with_penalty(params):
    """Reported logprobs exclude the penalty warp (HF output_scores semantics) —
    engine must equal generate(return_logprobs=True)."""
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 100, size=(1, 7)).astype(np.int32)
    s = SamplingParams(greedy=True, repetition_penalty=1.4)
    tokens, lengths, lp = gen.generate(params, CFG, jnp.asarray(ids), None,
                                       max_new_tokens=10, eos_token_id=EOS,
                                       sampling=s, capacity=256,
                                       compute_dtype=jnp.float32,
                                       return_logprobs=True)
    n = int(lengths[0])
    engine = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256,
                         chunk=4, eos_token_id=EOS,
                         sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    req = Request(request_id="a", ids=ids, max_new_tokens=10, sampling=s,
                  logprobs=True)
    engine.submit(req)
    engine.run_until_done()
    got = engine.finished["a"]
    ref = [int(t) for t in np.asarray(tokens)[0][:n]]
    m = min(len(ref), len(got))
    assert got[:m] == ref[:m]
    np.testing.assert_allclose(np.asarray(req.token_logprobs[:m]),
                               np.asarray(lp)[0][:m], rtol=1e-4, atol=1e-5)


def test_flamingo_engine_penalty_and_ngram():
    from audio_flamingo_tpu.runtime.flamingo_engine import (FlamingoEngine,
                                                            FlamingoRequest)

    eos = 95
    cfg = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2,
        audio_embed_dim=16,
    )
    fparams = flamingo.init(jax.random.PRNGKey(0), cfg)
    fparams["xattn"]["alpha_xattn"] = jnp.ones_like(fparams["xattn"]["alpha_xattn"])
    fparams["xattn"]["alpha_dense"] = jnp.ones_like(fparams["xattn"]["alpha_dense"])
    rng = np.random.default_rng(3)
    wins = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
    samplings = [SamplingParams(greedy=True, repetition_penalty=1.3),
                 SamplingParams(greedy=True, no_repeat_ngram_size=2)]
    prompts = [rng.integers(0, 90, size=(1, 6 + i)).astype(np.int32)
               for i in range(len(samplings))]
    engine = FlamingoEngine(params=fparams, cfg=cfg, num_slots=2, capacity=256,
                            chunk=4, eos_token_id=eos,
                            sampling=SamplingParams(greedy=True),
                            compute_dtype=jnp.float32, n_media=1,
                            windows_per_media=4)
    for i, (p, s) in enumerate(zip(prompts, samplings)):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=p, max_new_tokens=10,
                                      sampling=s, window_embeds=wins))
    results = engine.run_until_done()
    for i, (p, s) in enumerate(zip(prompts, samplings)):
        tokens, lengths = flamingo.generate(
            fparams, cfg, jnp.asarray(p), jnp.asarray(wins), max_new_tokens=10,
            eos_token_id=eos, sampling=s, rng=jax.random.PRNGKey(0), capacity=256,
            compute_dtype=jnp.float32)
        ref = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)
