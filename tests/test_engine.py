"""Batch engine tests: engine greedy output == single-request generate; slot reuse;
more requests than slots; mid-flight admission correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
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


def _reference_tokens(params, ids, max_new):
    tokens, lengths = gen.generate(params, CFG, jnp.asarray(ids), None,
                                   max_new_tokens=max_new, eos_token_id=EOS,
                                   sampling=SamplingParams(greedy=True),
                                   capacity=256, compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


def test_engine_matches_single_request(params):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 120, size=(1, 5 + i)) for i in range(5)]  # 5 reqs, 2 slots
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p.astype(np.int32),
                              max_new_tokens=12))
    results = engine.run_until_done()
    assert set(results) == {f"r{i}" for i in range(5)}
    for i, p in enumerate(prompts):
        ref = _reference_tokens(params, p.astype(np.int32), 12)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_engine_slot_reuse_isolation(params):
    """A slot reused by a later request must not leak the earlier request's KV."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 120, size=(1, 6)).astype(np.int32)
    b = rng.integers(0, 120, size=(1, 9)).astype(np.int32)
    # run a then b through a single-slot engine
    engine = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    engine.submit(Request(request_id="a", ids=a, max_new_tokens=8))
    engine.submit(Request(request_id="b", ids=b, max_new_tokens=8))
    results = engine.run_until_done()
    ref_b = _reference_tokens(params, b, 8)
    n = min(len(ref_b), len(results["b"]))
    assert results["b"][:n] == ref_b[:n]


def test_engine_audio_requests(params):
    """Requests with mels flow through engine prefill (scatter included)."""
    rng = np.random.default_rng(4)
    frames = 2 * CFG.encoder.max_source_positions
    ntok = CFG.encoder.max_source_positions // CFG.encoder.pool_stride
    ids = np.concatenate([np.full((1, ntok), CFG.audio_token_id),
                          rng.integers(0, 120, (1, 4))], axis=1).astype(np.int32)
    mels = rng.normal(size=(1, 1, frames, CFG.encoder.num_mel_bins)).astype(np.float32)
    ref, ref_len = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                                max_new_tokens=6, eos_token_id=EOS, capacity=256,
                                sampling=SamplingParams(greedy=True),
                                compute_dtype=jnp.float32)
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256, chunk=3,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    engine.submit(Request(request_id="a", ids=ids, mels=mels, max_new_tokens=6))
    results = engine.run_until_done()
    r = [int(t) for t in np.asarray(ref)[0][: int(ref_len[0])]]
    got = results["a"]
    n = min(len(r), len(got))
    assert got[:n] == r[:n]
