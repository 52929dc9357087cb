"""AF1/AF2 batched serving engine: engine greedy == single-request
flamingo.generate for both the Qwen2 (AF2) and OPT (AF1) backbones; slot reuse;
more requests than slots (VERDICT round-1 Weak #7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import (AF2Config, ClapAudioConfig, GatedXAttnConfig,
                                       OPTConfig, Qwen2Config)
from audio_flamingo_tpu.models import flamingo
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
                 max_position_embeddings=128),
    xattn=GatedXAttnConfig(cross_every_n_layers=2, num_heads=4, ffn_mult=2),
    num_audio_transform_layers=2,
    audio_embed_dim=16,
)
N_MEDIA, WPM = 1, 4


def _params(cfg, gates=True):
    params = flamingo.init(jax.random.PRNGKey(0), cfg)
    if gates:  # open the zero-init tanh gates so media actually matters
        params["xattn"]["alpha_xattn"] = jnp.ones_like(params["xattn"]["alpha_xattn"])
        params["xattn"]["alpha_dense"] = jnp.ones_like(params["xattn"]["alpha_dense"])
    return params


def _reference(params, cfg, ids, wins, max_new):
    tokens, lengths = flamingo.generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(wins), max_new_tokens=max_new,
        eos_token_id=EOS, sampling=SamplingParams(greedy=True),
        rng=jax.random.PRNGKey(0), capacity=256, compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


@pytest.mark.parametrize("cfg", [AF2_CFG, AF1_CFG], ids=["af2-qwen2", "af1-opt"])
def test_engine_matches_single_request(cfg):
    params = _params(cfg)
    rng = np.random.default_rng(0)
    reqs = []
    for i in range(4):  # 4 requests, 2 slots
        ids = rng.integers(0, 90, size=(1, 4 + i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        reqs.append((ids, wins))
    engine = FlamingoEngine(params=params, cfg=cfg, num_slots=2, capacity=256,
                            chunk=4, eos_token_id=EOS,
                            sampling=SamplingParams(greedy=True),
                            n_media=N_MEDIA, windows_per_media=WPM)
    for i, (ids, wins) in enumerate(reqs):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids,
                                      window_embeds=wins, max_new_tokens=10))
    results = engine.run_until_done()
    assert set(results) == {f"r{i}" for i in range(4)}
    for i, (ids, wins) in enumerate(reqs):
        ref = _reference(params, cfg, ids, wins, 10)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_slot_reuse_does_not_leak_media():
    """A reused slot must serve the NEW request's audio, not the previous one's."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(1)
    wins_a = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    wins_b = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    ids = rng.integers(0, 90, size=(1, 6)).astype(np.int32)
    engine = FlamingoEngine(params=params, cfg=AF2_CFG, num_slots=1, capacity=256,
                            chunk=4, eos_token_id=EOS,
                            sampling=SamplingParams(greedy=True),
                            n_media=N_MEDIA, windows_per_media=WPM)
    engine.submit(FlamingoRequest(request_id="a", ids=ids, window_embeds=wins_a,
                                  max_new_tokens=8))
    engine.submit(FlamingoRequest(request_id="b", ids=ids, window_embeds=wins_b,
                                  max_new_tokens=8))
    results = engine.run_until_done()
    ref_b = _reference(params, AF2_CFG, ids, wins_b, 8)
    n = min(len(ref_b), len(results["b"]))
    assert results["b"][:n] == ref_b[:n]
    # and the two requests (different audio) genuinely diverge
    assert results["a"] != results["b"]


def test_engine_fused_w4_matches_single_request():
    """Fused-w4 (quantize_lm_params_w4 fuse=True) LM trees serve through the
    xattn slot engine token-exactly vs the single-shot generate on the SAME
    quantized params (the stacked 'qkv'/'gateup' dicts ride the scalar-prefetch
    kernel; the engine formerly asserted against them)."""
    from audio_flamingo_tpu.ops.quant4 import quantize_lm_params_w4

    params = _params(AF2_CFG)
    params = dict(params)
    params["lm"] = quantize_lm_params_w4(params["lm"], group_size=16)
    assert "qkv" in params["lm"]["layers"]  # the fused tree is what we test
    rng = np.random.default_rng(3)
    reqs = []
    for i in range(3):
        ids = rng.integers(0, 90, size=(1, 4 + i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        reqs.append((ids, wins))
    engine = FlamingoEngine(params=params, cfg=AF2_CFG, num_slots=2, capacity=256,
                            chunk=4, eos_token_id=EOS,
                            sampling=SamplingParams(greedy=True),
                            n_media=N_MEDIA, windows_per_media=WPM)
    for i, (ids, wins) in enumerate(reqs):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids,
                                      window_embeds=wins, max_new_tokens=8))
    results = engine.run_until_done()
    for i, (ids, wins) in enumerate(reqs):
        ref = _reference(params, AF2_CFG, ids, wins, 8)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)
