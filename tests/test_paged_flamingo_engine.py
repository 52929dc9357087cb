"""Paged AF1/AF2 engine (VERDICT r2 Next #5): paged xattn engine == single-request
flamingo.generate token-exactly, for Qwen2 (AF2) and OPT (AF1) backbones, bf16/int8
pools, under pool pressure (preemption), and with history processors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import (AF2Config, ClapAudioConfig, GatedXAttnConfig,
                                       OPTConfig, Qwen2Config)
from audio_flamingo_tpu.models import flamingo
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.flamingo_engine import FlamingoRequest
from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

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
N_MEDIA, WPM = 1, 4


def _params(cfg):
    params = flamingo.init(jax.random.PRNGKey(0), cfg)
    params["xattn"]["alpha_xattn"] = jnp.ones_like(params["xattn"]["alpha_xattn"])
    params["xattn"]["alpha_dense"] = jnp.ones_like(params["xattn"]["alpha_dense"])
    return params


def _reference(params, cfg, ids, wins, max_new, sampling=None):
    tokens, lengths = flamingo.generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(wins), max_new_tokens=max_new,
        eos_token_id=EOS, sampling=sampling or SamplingParams(greedy=True),
        rng=jax.random.PRNGKey(0), capacity=256, compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


def _run_equality(cfg, kv_dtype=None, num_blocks=24, sampling_list=None,
                  attn_impl="auto"):
    params = _params(cfg)
    rng = np.random.default_rng(0)
    n_req = 4
    samplings = sampling_list or [SamplingParams(greedy=True)] * n_req
    reqs = []
    for i in range(len(samplings)):
        ids = rng.integers(0, 90, size=(1, 5 + 3 * i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        reqs.append((ids, wins))
    engine = PagedFlamingoEngine(
        params=params, cfg=cfg, num_rows=2, num_blocks=num_blocks, block_size=16,
        max_blocks_per_seq=8, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
        kv_dtype=kv_dtype, n_media=N_MEDIA, windows_per_media=WPM,
        attn_impl=attn_impl)
    for i, ((ids, wins), s) in enumerate(zip(reqs, samplings)):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids, max_new_tokens=10,
                                      window_embeds=wins, sampling=s))
    results = engine.run_until_done()
    assert set(results) == {f"r{i}" for i in range(len(samplings))}
    for i, ((ids, wins), s) in enumerate(zip(reqs, samplings)):
        ref = _reference(params, cfg, ids, wins, 10, s)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)
    return engine


@pytest.mark.parametrize("cfg", [AF2_CFG, AF1_CFG], ids=["af2-qwen2", "af1-opt"])
def test_paged_engine_matches_single_request(cfg):
    _run_equality(cfg)


def test_paged_engine_int8_pool():
    """int8 page pool: greedy output must match the bf16/f32 engine's first tokens
    (int8 KV keeps logits within the quantization band; at tiny scale greedy chains
    usually agree — compare engine vs engine so tolerance semantics are identical)."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 90, size=(1, 7)).astype(np.int32)
    wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)

    def run(kv_dtype):
        eng = PagedFlamingoEngine(
            params=params, cfg=AF2_CFG, num_rows=1, num_blocks=16, block_size=16,
            max_blocks_per_seq=8, chunk=4, eos_token_id=EOS,
            sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
            kv_dtype=kv_dtype, n_media=N_MEDIA, windows_per_media=WPM)
        eng.submit(FlamingoRequest(request_id="a", ids=ids, max_new_tokens=8,
                                   window_embeds=wins))
        return eng.run_until_done()["a"]

    full = run(None)
    q8 = run(jnp.int8)
    n = min(len(full), len(q8), 3)
    assert q8[:n] == full[:n], (q8, full)


def test_paged_engine_pool_pressure_preempts():
    """A pool too small for all rows must preempt (not truncate): every request still
    finishes with its exact single-request stream."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(2)
    # bucket_tokens floors at 128 -> 8 prompt pages/row (block 16); capacity is 16
    # pages, so decoding past 128 tokens GROWS rows; a 26-block pool (3x8 prompt +
    # little headroom) must preempt under three growing rows
    reqs = [(rng.integers(0, 90, size=(1, 100 + 9 * i)).astype(np.int32),
             rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32))
            for i in range(3)]
    engine = PagedFlamingoEngine(
        params=params, cfg=AF2_CFG, num_rows=3, num_blocks=26, block_size=16,
        max_blocks_per_seq=16, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
        n_media=N_MEDIA, windows_per_media=WPM)
    for i, (ids, wins) in enumerate(reqs):
        engine.submit(FlamingoRequest(request_id=f"r{i}", ids=ids, max_new_tokens=48,
                                      window_embeds=wins))
    results = engine.run_until_done()
    assert engine.preemptions > 0, "workload sized to force preemption"
    assert not engine.swapped and not engine.queue
    for i, (ids, wins) in enumerate(reqs):
        tokens, lengths = flamingo.generate(
            params, AF2_CFG, jnp.asarray(reqs[i][0]), jnp.asarray(reqs[i][1]),
            max_new_tokens=48, eos_token_id=EOS,
            sampling=SamplingParams(greedy=True), rng=jax.random.PRNGKey(0),
            capacity=256, compute_dtype=jnp.float32)
        ref = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_paged_engine_history_processors():
    _run_equality(AF2_CFG, sampling_list=[
        SamplingParams(greedy=True, repetition_penalty=1.3),
        SamplingParams(greedy=True, no_repeat_ngram_size=2),
        SamplingParams(greedy=True),
    ])


def test_paged_engine_media_isolation():
    """Row reuse must not leak the earlier request's media features."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 90, size=(1, 6)).astype(np.int32)
    wins_a = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    wins_b = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    engine = PagedFlamingoEngine(
        params=params, cfg=AF2_CFG, num_rows=1, num_blocks=16, block_size=16,
        max_blocks_per_seq=8, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
        n_media=N_MEDIA, windows_per_media=WPM)
    engine.submit(FlamingoRequest(request_id="a", ids=ids, max_new_tokens=8,
                                  window_embeds=wins_a))
    engine.submit(FlamingoRequest(request_id="b", ids=ids, max_new_tokens=8,
                                  window_embeds=wins_b))
    results = engine.run_until_done()
    ref_b = _reference(params, AF2_CFG, ids, wins_b, 8)
    n = min(len(ref_b), len(results["b"]))
    assert results["b"][:n] == ref_b[:n]


def test_paged_engine_prefix_cache_exact_and_audio_isolated():
    """Automatic prefix caching for the xattn family: a shared (ids-prefix, SAME
    audio) pair reuses pages and stays token-exact; identical ids with DIFFERENT
    audio must not share (keys fold in the media digest — xattn makes every
    position audio-dependent)."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(5)
    prefix = rng.integers(0, 90, size=(1, 128)).astype(np.int32)
    tail_a = rng.integers(0, 90, size=(1, 16)).astype(np.int32)
    tail_b = rng.integers(0, 90, size=(1, 24)).astype(np.int32)
    wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    wins2 = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    ids_a = np.concatenate([prefix, tail_a], axis=1)
    ids_b = np.concatenate([prefix, tail_b], axis=1)

    eng = PagedFlamingoEngine(
        params=params, cfg=AF2_CFG, num_rows=2, num_blocks=48, block_size=16,
        max_blocks_per_seq=16, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
        prefix_cache=True, n_media=N_MEDIA, windows_per_media=WPM)
    eng.submit(FlamingoRequest(request_id="a", ids=ids_a, max_new_tokens=8,
                               window_embeds=wins))
    eng.run_until_done()
    assert eng.store.entries, "full prompt blocks registered"
    # same audio + shared prefix: must HIT and stay exact
    eng.submit(FlamingoRequest(request_id="b", ids=ids_b, max_new_tokens=8,
                               window_embeds=wins))
    results = eng.run_until_done()
    assert eng.store.hits > 0, "expected a prefix hit"
    ref_b = _reference(params, AF2_CFG, ids_b, wins, 8)
    n = min(len(ref_b), len(results["b"]))
    assert results["b"][:n] == ref_b[:n], (results["b"], ref_b)
    # different audio, same ids: must MISS (no false sharing) and stay exact
    hits_before = eng.store.hits
    eng.submit(FlamingoRequest(request_id="c", ids=ids_b, max_new_tokens=8,
                               window_embeds=wins2))
    results = eng.run_until_done()
    assert eng.store.hits == hits_before, "different audio must not share pages"
    ref_c = _reference(params, AF2_CFG, ids_b, wins2, 8)
    n = min(len(ref_c), len(results["c"]))
    assert results["c"][:n] == ref_c[:n], (results["c"], ref_c)


def test_paged_engine_chunked_prefill_exact():
    """Chunked xattn prefill: a long prompt prefills one chunk per engine round
    (media transformed once up front) and the stream stays token-exact; a short
    request admitted behind it decodes in between (no full-prompt stall)."""
    params = _params(AF2_CFG)
    rng = np.random.default_rng(6)
    long_ids = rng.integers(0, 90, size=(1, 120)).astype(np.int32)
    short_ids = rng.integers(0, 90, size=(1, 6)).astype(np.int32)
    wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
    eng = PagedFlamingoEngine(
        params=params, cfg=AF2_CFG, num_rows=2, num_blocks=24, block_size=16,
        max_blocks_per_seq=12, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
        prefill_chunk=32, n_media=N_MEDIA, windows_per_media=WPM)
    eng.submit(FlamingoRequest(request_id="long", ids=long_ids, max_new_tokens=8,
                               window_embeds=wins))
    eng.submit(FlamingoRequest(request_id="short", ids=short_ids, max_new_tokens=8,
                               window_embeds=wins))
    results = eng.run_until_done()
    for rid, ids in (("long", long_ids), ("short", short_ids)):
        ref = _reference(params, AF2_CFG, ids, wins, 8)
        got = results[rid]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (rid, got, ref)


def test_paged_engine_fused_w4():
    """Fused-w4 LM trees serve through the PAGED xattn engine token-exactly
    (stacked packed weights indexed in-kernel per layer; no fuse=False detour)."""
    from audio_flamingo_tpu.ops.quant4 import quantize_lm_params_w4

    params = _params(AF2_CFG)
    params = dict(params)
    params["lm"] = quantize_lm_params_w4(params["lm"], group_size=16)
    assert "qkv" in params["lm"]["layers"]
    rng = np.random.default_rng(4)
    reqs = []
    for i in range(3):
        ids = rng.integers(0, 90, size=(1, 5 + 2 * i)).astype(np.int32)
        wins = rng.normal(size=(1, N_MEDIA, WPM, 16)).astype(np.float32)
        reqs.append((ids, wins))
    engine = PagedFlamingoEngine(
        params=params, cfg=AF2_CFG, num_rows=2, num_blocks=24, block_size=16,
        max_blocks_per_seq=8, chunk=4, eos_token_id=EOS,
        sampling=SamplingParams(greedy=True), compute_dtype=jnp.float32,
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


@pytest.mark.parametrize("attn_impl", ["kernel", "dense"])
def test_paged_engine_attn_impl_pins(attn_impl):
    """Both paged-attention implementations (Pallas kernel / XLA dense gather
    — _paged_attn_fn picks per pool geometry in "auto") must be token-exact
    vs single-request generate; pinning keeps BOTH covered regardless of what
    "auto" resolves to at test pool sizes."""
    _run_equality(AF2_CFG, attn_impl=attn_impl)
