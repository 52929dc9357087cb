"""Chunked prefill (Sarathi-style stall control) in the paged engine: long prompt
prefills advance one chunk per engine round while active rows keep decoding.
Equality vs the unchunked engine, decode interleaving, and composition with the
prefix cache / int8 page pool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.engine import Request
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 127
BLOCK = 8
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


def _engine(params, **kw):
    return PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=24,
                       block_size=BLOCK, max_blocks_per_seq=8, chunk=4,
                       eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                       compute_dtype=jnp.float32, **kw)


def _workload():
    rng = np.random.default_rng(11)
    ntok = CFG.encoder.max_source_positions // CFG.encoder.pool_stride
    frames = 2 * CFG.encoder.max_source_positions
    mels = rng.normal(size=(1, 1, frames, CFG.encoder.num_mel_bins)).astype(np.float32)
    audio_ids = np.concatenate([np.full((1, ntok), CFG.audio_token_id),
                                rng.integers(0, 120, (1, 30))], axis=1).astype(np.int32)
    return [
        Request(request_id="long", ids=rng.integers(0, 120, (1, 43)).astype(np.int32),
                max_new_tokens=8),
        Request(request_id="short", ids=rng.integers(0, 120, (1, 6)).astype(np.int32),
                max_new_tokens=8),
        Request(request_id="audio", ids=audio_ids, mels=mels, max_new_tokens=8),
        Request(request_id="long2", ids=rng.integers(0, 120, (1, 43)).astype(np.int32),
                max_new_tokens=8),
    ]


@pytest.mark.parametrize("extra", [{}, {"prefix_cache": True},
                                   {"kv_dtype": jnp.int8}])
def test_chunked_matches_unchunked(params, extra):
    eng_p = _engine(params, **extra)
    for r in _workload():
        eng_p.submit(r)
    plain = eng_p.run_until_done()
    eng_c = _engine(params, prefill_chunk=16, **extra)
    for r in _workload():
        eng_c.submit(r)
    chunked = eng_c.run_until_done()
    assert set(chunked) == set(plain)
    for k in plain:
        assert chunked[k] == plain[k], (k, chunked[k], plain[k])
    assert eng_c.prefilling is None
    # pool fully reclaimed (any store-owned pages are accounted separately)
    owned = {e[0] for e in eng_c.store.entries.values()} if eng_c.store else set()
    assert len(owned) + len(eng_c.allocator.free) == eng_c.num_blocks - 1


def test_decode_interleaves_with_chunked_prefill(params):
    """An active row keeps emitting tokens while a long prompt prefills."""
    rng = np.random.default_rng(12)
    eng = _engine(params, prefill_chunk=16)
    eng.submit(Request(request_id="short",
                       ids=rng.integers(0, 120, (1, 6)).astype(np.int32),
                       max_new_tokens=30))
    eng.step()                       # short active + first decode chunk
    n0 = len(eng.active[0][0].tokens)
    assert n0 > 0
    eng.submit(Request(request_id="long",
                       ids=rng.integers(0, 120, (1, 43)).astype(np.int32),
                       max_new_tokens=4))
    eng.step()                       # long: chunk 1 of prefill; short keeps decoding
    assert eng.prefilling is not None and "long" not in eng.finished
    n1 = len(eng.active[0][0].tokens)
    assert n1 > n0                   # decode progressed during the prefill chunk
    eng.step()                       # more chunks; still interleaving
    n2 = len(eng.active[0][0].tokens)
    assert n2 > n1
    results = eng.run_until_done()
    assert set(results) == {"short", "long"}


def test_chunked_prefill_skips_pure_pad_chunks(params):
    """t=43 in a 64-bucket with chunk 16: chunks cover [0,48) only — the pure-pad
    tail [48,64) is never prefilled and its pages are never allocated."""
    rng = np.random.default_rng(13)
    eng = _engine(params, prefill_chunk=16)
    eng.submit(Request(request_id="r",
                       ids=rng.integers(0, 120, (1, 43)).astype(np.int32),
                       max_new_tokens=2))
    eng._admit()
    st = eng.prefilling
    assert st is not None and st["ce"] == 48 and len(st["own"]) == 6
    results = eng.run_until_done()
    assert list(results) == ["r"]
