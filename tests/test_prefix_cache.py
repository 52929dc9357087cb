"""Automatic prefix caching (paged engine): suffix-only prefill against shared
prompt pages == full prefill; engine with prefix_cache on == engine with it off;
store refcounts survive pool pressure.

Semantic model: vLLM-style block-hash prefix sharing over the StaticCache-shaped
page pool ([hf] cache_utils.py:1031 is the dense semantics being paged)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.engine import Request
from audio_flamingo_tpu.runtime.paged_cache import (
    init_paged,
    paged_install_pages,
    paged_prefill_suffix,
)
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine, PrefixStore, _block_keys

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


# ------------------------------------------------------------------ store unit

def test_prefix_store_refcounts_and_eviction():
    s = PrefixStore()
    assert s.register(b"a", 5) and s.register(b"b", 6)
    assert not s.register(b"a", 7)          # duplicate key -> caller keeps page
    assert s.longest_run([b"a", b"b", b"c"]) == 2
    assert s.acquire([b"a"]) == [5]         # refcount 2 now
    assert s.evict(10) == []                # everything referenced
    s.release([b"a"])
    s.release([b"a", b"b"])                 # drop the registration references
    assert sorted(s.evict(10)) == [5, 6]
    assert s.entries == {}


def test_block_keys_audio_scoping():
    ids = np.arange(32, dtype=np.int32)
    plain = _block_keys(ids, 8, None, None)
    # audio starting in block 1: block 0 key unchanged (text-only prefix shared
    # between audio and text requests), later keys fold in the mel digest
    with_audio = _block_keys(ids, 8, b"meldigest", 9)
    assert plain[0] == with_audio[0]
    assert plain[1] != with_audio[1] and plain[2] != with_audio[2]
    # different audio -> different keys from the audio block on
    other = _block_keys(ids, 8, b"otherdigest", 9)
    assert other[0] == with_audio[0] and other[1] != with_audio[1]


# ------------------------------------------------------- suffix prefill == full

@pytest.mark.parametrize("pool_dtype", [jnp.float32, jnp.int8])
def test_prefill_suffix_matches_full(params, pool_dtype):
    """Prefill of tokens [16:24) against 2 shared prefix pages reproduces the
    full-prompt prefill: same last-token logits, same KV written to pages."""
    from audio_flamingo_tpu.models import qwen2

    rng = np.random.default_rng(3)
    t = 24
    ids = jnp.asarray(rng.integers(0, 120, (1, t)), jnp.int32)

    # full prefill -> install ALL pages (the donor request)
    full = qwen2.init_cache(CFG.lm, 1, 32, dtype=jnp.float32)
    x = qwen2.embed(params["lm"], ids, dtype=jnp.float32)
    h, full = qwen2.forward(params["lm"], CFG.lm, x, jnp.arange(t)[None], cache=full)
    want_logits = qwen2.unembed(params["lm"], CFG.lm, h[:, t - 1])

    paged = init_paged(CFG.lm, batch=1, num_blocks=12, block_size=BLOCK,
                       max_blocks_per_seq=4, dtype=pool_dtype)
    donor_pages = jnp.asarray([3, 7, 2, 9], jnp.int32)
    paged = paged_install_pages(paged, full.k, full.v, donor_pages, CFG.lm,
                                compute_dtype=jnp.float32)

    # suffix prefill: prefix = pages [3, 7] (tokens 0..16), suffix = tokens 16..24
    emb = qwen2.embed(params["lm"], ids[:, 16:], dtype=jnp.float32)
    sub_k, sub_v, logits = paged_prefill_suffix(
        params["lm"], CFG.lm, paged, jnp.asarray([3, 7], jnp.int32), emb,
        jnp.asarray(t, jnp.int32), n_prefix_pages=2, suffix_len=8,
        compute_dtype=jnp.float32)

    tol = dict(atol=1e-4, rtol=1e-4) if pool_dtype == jnp.float32 else \
        dict(atol=3e-2, rtol=3e-2)   # int8 prefix pages carry quantization noise
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want_logits), **tol)
    if pool_dtype == jnp.float32:
        np.testing.assert_allclose(np.asarray(sub_k[:, 0]),
                                   np.asarray(full.k[:, 0, 16:24]), atol=1e-4)


# --------------------------------------------------------- engine equivalence

def _workload(rng):
    shared = rng.integers(0, 120, (1, 17)).astype(np.int32)
    reqs = [
        Request(request_id="a", ids=shared, max_new_tokens=8),
        Request(request_id="b", ids=shared.copy(), max_new_tokens=8),  # full hit
        Request(request_id="c",
                ids=np.concatenate([shared[:, :16],
                                    rng.integers(0, 120, (1, 5)).astype(np.int32)],
                                   axis=1),
                max_new_tokens=8),                                     # partial hit
        Request(request_id="d", ids=rng.integers(0, 120, (1, 9)).astype(np.int32),
                max_new_tokens=8),                                     # miss
    ]
    return reqs


def _run_engine(params, reqs, **kw):
    eng = PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=24,
                      block_size=BLOCK, max_blocks_per_seq=4, chunk=4,
                      eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                      compute_dtype=jnp.float32, **kw)
    for r in reqs:
        eng.submit(r)
    return eng, eng.run_until_done()


def test_prefix_engine_matches_plain(params):
    rng = np.random.default_rng(5)
    reqs = _workload(rng)
    _, plain = _run_engine(params, [Request(r.request_id, r.ids.copy(),
                                            max_new_tokens=r.max_new_tokens)
                                    for r in reqs])
    eng, cached = _run_engine(params, _workload(np.random.default_rng(5)),
                              prefix_cache=True)
    assert set(cached) == set(plain)
    for k in plain:
        assert cached[k] == plain[k], (k, cached[k], plain[k])
    assert eng.store.hits > 0          # b and c actually shared pages
    # pool bookkeeping: every page is exactly one of {free, store-owned}
    owned = {e[0] for e in eng.store.entries.values()}
    assert owned.isdisjoint(eng.allocator.free)
    assert len(owned) + len(eng.allocator.free) == eng.num_blocks - 1  # minus trash


def test_prefix_engine_audio_encoder_skip(params, monkeypatch):
    """Same clip + same prompt: the second request's audio rides in on shared
    pages; build_input_embeds is traced with mels=None (encoder skipped)."""
    rng = np.random.default_rng(6)
    ntok = CFG.encoder.max_source_positions // CFG.encoder.pool_stride
    frames = 2 * CFG.encoder.max_source_positions
    ids = np.concatenate([np.full((1, ntok), CFG.audio_token_id),
                          rng.integers(0, 120, (1, 12))], axis=1).astype(np.int32)
    mels = rng.normal(size=(1, 1, frames, CFG.encoder.num_mel_bins)).astype(np.float32)
    reqs = lambda: [Request(request_id=f"r{i}", ids=ids.copy(), mels=mels.copy(),
                            max_new_tokens=6) for i in range(2)]
    _, plain = _run_engine(params, reqs())
    eng, cached = _run_engine(params, reqs(), prefix_cache=True)
    for k in plain:
        assert cached[k] == plain[k], (k, cached[k], plain[k])
    assert eng.store.hits > 0


def test_prefix_engine_different_audio_not_shared(params):
    """Identical token ids with DIFFERENT audio must not share audio-covering
    pages (the mel digest is folded into the block keys)."""
    rng = np.random.default_rng(7)
    ntok = CFG.encoder.max_source_positions // CFG.encoder.pool_stride
    frames = 2 * CFG.encoder.max_source_positions
    ids = np.concatenate([np.full((1, ntok), CFG.audio_token_id),
                          rng.integers(0, 120, (1, 12))], axis=1).astype(np.int32)
    mels1 = rng.normal(size=(1, 1, frames, CFG.encoder.num_mel_bins)).astype(np.float32)
    mels2 = rng.normal(size=(1, 1, frames, CFG.encoder.num_mel_bins)).astype(np.float32)

    def reqs(m2):
        return [Request(request_id="x", ids=ids.copy(), mels=mels1.copy(),
                        max_new_tokens=6),
                Request(request_id="y", ids=ids.copy(), mels=m2.copy(),
                        max_new_tokens=6)]

    _, plain = _run_engine(params, reqs(mels2))
    eng, cached = _run_engine(params, reqs(mels2), prefix_cache=True)
    for k in plain:
        assert cached[k] == plain[k], (k, cached[k], plain[k])
    assert eng.store.hits == 0     # nothing shareable between different clips


def test_prefix_engine_pool_pressure_evicts_store(params):
    """A pool too small to keep warm prefixes resident must evict refcount-0
    store pages instead of starving admissions."""
    rng = np.random.default_rng(8)
    long_a = rng.integers(0, 120, (1, 25)).astype(np.int32)
    long_b = rng.integers(0, 120, (1, 25)).astype(np.int32)
    reqs = lambda: [Request(request_id="a", ids=long_a.copy(), max_new_tokens=6),
                    Request(request_id="b", ids=long_b.copy(), max_new_tokens=6),
                    Request(request_id="a2", ids=long_a.copy(), max_new_tokens=6)]
    # 11 usable pages; each request needs 4 prompt pages + headroom -> b's admit
    # must evict a's warm prefix, then a2 re-prefills from scratch
    eng = PagedEngine(params=params, cfg=CFG, num_rows=1, num_blocks=12,
                      block_size=BLOCK, max_blocks_per_seq=4, chunk=4,
                      eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                      compute_dtype=jnp.float32, prefix_cache=True)
    for r in reqs():
        eng.submit(r)
    cached = eng.run_until_done()
    _, plain = _run_engine(params, reqs())
    for k in plain:
        assert cached[k] == plain[k], (k, cached[k], plain[k])
