"""Speculative decoding in the AF1/AF2 (gated-xattn) slot engine.

The draft is a text-only Qwen2 LM (ids shared; audio lives in the target's
media features). Exactness contract as the AF3 engines: greedy engine output
== single-request flamingo.generate token for token regardless of draft
quality, for BOTH backbones (Qwen2/AF2 and OPT/AF1); the sampled path is gated
on its greedy limit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import (AF2Config, ClapAudioConfig, GatedXAttnConfig,
                                       OPTConfig, Qwen2Config)
from audio_flamingo_tpu.models import flamingo, qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.flamingo_engine import FlamingoEngine, FlamingoRequest

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 95
AF2_CFG = AF2Config(
    clap=ClapAudioConfig(),
    lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
    num_audio_transform_layers=2,
    audio_embed_dim=16,
)
AF1_CFG = AF2Config(
    clap=ClapAudioConfig(),
    lm=OPTConfig(vocab_size=96, hidden_size=32, ffn_dim=64, num_layers=2, num_heads=4,
                 max_position_embeddings=512),
    xattn=GatedXAttnConfig(cross_every_n_layers=2, num_heads=4, ffn_mult=2),
    num_audio_transform_layers=2,
    audio_embed_dim=16,
)
DRAFT_CFG = Qwen2Config(vocab_size=96, hidden_size=24, intermediate_size=48,
                        num_layers=1, num_heads=4, num_kv_heads=2,
                        tie_word_embeddings=True)
N_MEDIA, WPM = 1, 4


@pytest.fixture(scope="module")
def draft_params():
    return qwen2.init(jax.random.PRNGKey(11), DRAFT_CFG)


def _params(cfg):
    params = flamingo.init(jax.random.PRNGKey(0), cfg)
    params["xattn"]["alpha_xattn"] = jnp.ones_like(params["xattn"]["alpha_xattn"])
    params["xattn"]["alpha_dense"] = jnp.ones_like(params["xattn"]["alpha_dense"])
    return params


def _reference(params, cfg, ids, wins, max_new):
    tokens, lengths = flamingo.generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(wins), max_new_tokens=max_new,
        eos_token_id=EOS, sampling=SamplingParams(greedy=True),
        rng=jax.random.PRNGKey(0), capacity=256, compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


def _run(cfg, params, draft_params, prompts, max_new, sampling, **kw):
    engine = FlamingoEngine(params=params, cfg=cfg, num_slots=2, capacity=256,
                            chunk=4, eos_token_id=EOS, sampling=sampling,
                            compute_dtype=jnp.float32, n_media=N_MEDIA,
                            windows_per_media=WPM, draft_params=draft_params,
                            draft_cfg=DRAFT_CFG, spec_k=3, spec_rounds=2, **kw)
    for i, (ids, wins) in enumerate(prompts):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids,
                                      window_embeds=wins, max_new_tokens=max_new))
    return engine, engine.run_until_done()


@pytest.mark.parametrize("cfg", [AF2_CFG, AF1_CFG], ids=["af2-qwen2", "af1-opt"])
def test_xattn_spec_greedy_exact(cfg, draft_params):
    """Greedy xattn speculation == single-request generate, both backbones,
    with an independent (adversarial) random draft — rollback exactness."""
    params = _params(cfg)
    rng = np.random.default_rng(0)
    prompts = []
    for i in range(3):
        ids = rng.integers(0, 90, size=(1, 4 + i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        prompts.append((ids, wins))
    engine, results = _run(cfg, params, draft_params, prompts, 10,
                           SamplingParams(greedy=True))
    assert engine._speculating()
    for i, (ids, wins) in enumerate(prompts):
        ref = _reference(params, cfg, ids, wins, 10)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_xattn_spec_slot_reuse(draft_params):
    """More requests than slots: reused slots must not leak draft/target KV
    or media across requests."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(2)
    prompts = []
    for i in range(4):
        ids = rng.integers(0, 90, size=(1, 6)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        prompts.append((ids, wins))
    engine = FlamingoEngine(params=params, cfg=AF2_CFG, num_slots=1, capacity=256,
                            chunk=4, eos_token_id=EOS,
                            sampling=SamplingParams(greedy=True),
                            compute_dtype=jnp.float32, n_media=N_MEDIA,
                            windows_per_media=WPM, draft_params=draft_params,
                            draft_cfg=DRAFT_CFG, spec_k=2, spec_rounds=2)
    for i, (ids, wins) in enumerate(prompts):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids,
                                      window_embeds=wins, max_new_tokens=8))
    results = engine.run_until_done()
    for i, (ids, wins) in enumerate(prompts):
        ref = _reference(params, AF2_CFG, ids, wins, 8)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_xattn_spec_sampled_greedy_limit(draft_params):
    """Sampled xattn speculation at top_k=1 + tiny temperature == plain greedy."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(3)
    prompts = []
    for i in range(2):
        ids = rng.integers(0, 90, size=(1, 5 + i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        prompts.append((ids, wins))
    engine, results = _run(
        AF2_CFG, params, draft_params, prompts, 10,
        SamplingParams(greedy=False, temperature=1e-4, top_k=1))
    assert engine._spec_sampled()
    for i, (ids, wins) in enumerate(prompts):
        ref = _reference(params, AF2_CFG, ids, wins, 10)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_xattn_spec_accept_sim_mechanics(draft_params):
    """Bernoulli acceptance-injection mode: counts/termination only."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 90, size=(1, 6)).astype(np.int32)
    wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    for a in (1.0, 0.0):
        engine = FlamingoEngine(params=params, cfg=AF2_CFG, num_slots=1,
                                capacity=256, chunk=4, eos_token_id=EOS,
                                sampling=SamplingParams(greedy=True),
                                compute_dtype=jnp.float32, n_media=N_MEDIA,
                                windows_per_media=WPM,
                                draft_params=draft_params, draft_cfg=DRAFT_CFG,
                                spec_k=2, spec_rounds=2, spec_accept_sim=a)
        engine.submit(FlamingoRequest(request_id="x", ids=ids,
                                      window_embeds=wins, max_new_tokens=9))
        results = engine.run_until_done(max_rounds=50)
        assert 1 <= len(results["x"]) <= 9


@pytest.mark.parametrize("cfg,kv_dtype", [
    (AF2_CFG, None), (AF2_CFG, jnp.int8), (AF1_CFG, None)],
    ids=["af2-f32pool", "af2-q8pool", "af1-opt"])
def test_paged_xattn_spec_greedy_exact(cfg, kv_dtype, draft_params):
    """Greedy speculation on the PAGED xattn engine == plain paged xattn engine
    (same pool dtype — the shared numeric base), both backbones + int8 pool."""
    from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

    params = _params(cfg)
    rng = np.random.default_rng(7)
    prompts = []
    for i in range(3):
        ids = rng.integers(0, 90, size=(1, 5 + 2 * i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        prompts.append((ids, wins))

    def run(**kw):
        engine = PagedFlamingoEngine(
            params=params, cfg=cfg, num_rows=2, num_blocks=32, block_size=16,
            max_blocks_per_seq=8, chunk=4, eos_token_id=EOS,
            sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
            preempt=False, kv_dtype=kv_dtype, n_media=N_MEDIA,
            windows_per_media=WPM, **kw)
        for i, (ids, wins) in enumerate(prompts):
            engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids,
                                          window_embeds=wins, max_new_tokens=8))
        return engine.run_until_done()

    spec = run(draft_params=draft_params, draft_cfg=DRAFT_CFG,
               spec_k=3, spec_rounds=2)
    plain = run()
    for rid, toks in plain.items():
        got = spec[rid]
        n = min(len(got), len(toks))
        assert got[:n] == toks[:n], (rid, got, toks)


def test_paged_xattn_spec_sampled_greedy_limit(draft_params):
    from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

    params = _params(AF2_CFG)
    rng = np.random.default_rng(8)
    ids = rng.integers(0, 90, size=(1, 6)).astype(np.int32)
    wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    engine = PagedFlamingoEngine(
        params=params, cfg=AF2_CFG, num_rows=1, num_blocks=32, block_size=16,
        max_blocks_per_seq=8, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=False, temperature=1e-4, top_k=1),
        compute_dtype=jnp.float32, preempt=False, n_media=N_MEDIA,
        windows_per_media=WPM, draft_params=draft_params, draft_cfg=DRAFT_CFG,
        spec_k=2, spec_rounds=2)
    assert engine._spec_sampled()
    engine.submit(FlamingoRequest(request_id="r", ids=ids, window_embeds=wins,
                                  max_new_tokens=8))
    got = engine.run_until_done()["r"]
    ref = _reference(params, AF2_CFG, ids, wins, 8)
    n = min(len(ref), len(got))
    assert got[:n] == ref[:n], (got, ref)
