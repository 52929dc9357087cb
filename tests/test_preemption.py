"""Preempt-and-resume (KV swap to host) in the paged engine: pool pressure swaps a
row's pages out instead of truncating its output; the request resumes into fresh
pages and the final tokens are EXACTLY what an unpressured engine produces."""

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


def _run(params, num_blocks, prompts, max_new=48, **kw):
    # geometry: bucket_tokens floors at 128 -> admission maps 128/16 = 8 pages per
    # row; capacity is 16 pages (256 tokens), so decoding past 128 tokens GROWS
    # the row — a pool smaller than the rows' combined growth demand must preempt
    eng = PagedEngine(params=params, cfg=CFG, num_rows=3, num_blocks=num_blocks,
                      block_size=16, max_blocks_per_seq=16, chunk=4,
                      eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                      compute_dtype=jnp.float32, **kw)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=f"r{i}", ids=p.copy(), max_new_tokens=max_new))
    return eng, eng.run_until_done()


@pytest.mark.parametrize("kv_dtype", [None, jnp.int8])
def test_preemption_resume_token_exact(params, kv_dtype):
    """A pool too small for three growing rows must swap at least one out and
    still produce exactly the unpressured engine's tokens."""
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, 120, (1, 100 + 9 * i)).astype(np.int32)
               for i in range(3)]
    _, big = _run(params, 64, prompts, kv_dtype=kv_dtype)
    eng, small = _run(params, 26, prompts, kv_dtype=kv_dtype)
    assert small == big
    assert eng.preemptions > 0          # pressure actually exercised the swap path
    assert not eng.swapped and not eng.queue
    # pool fully reclaimed
    assert len(eng.allocator.free) == eng.num_blocks - 1


def test_preemption_off_truncates(params):
    """preempt=False restores the old eviction policy (finish early, prefix-exact)."""
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, 120, (1, 100 + 9 * i)).astype(np.int32)
               for i in range(3)]
    _, big = _run(params, 64, prompts)
    eng, small = _run(params, 26, prompts, preempt=False)
    assert eng.preemptions == 0
    assert set(small) == set(big)
    for k in big:
        n = min(len(small[k]), len(big[k]))
        assert small[k][:n] == big[k][:n]


def test_preemption_with_prefix_cache(params):
    """Swap + prefix cache compose: store pages are refcount-protected, private
    pages swap out, equality holds."""
    rng = np.random.default_rng(22)
    shared = rng.integers(0, 120, (1, 100)).astype(np.int32)
    prompts = [shared, shared.copy(), rng.integers(0, 120, (1, 109)).astype(np.int32)]
    _, big = _run(params, 64, prompts, prefix_cache=True)
    eng, small = _run(params, 26, prompts, prefix_cache=True)
    assert small == big
    owned = {e[0] for e in eng.store.entries.values()}
    assert owned.isdisjoint(eng.allocator.free)
    assert len(owned) + len(eng.allocator.free) == eng.num_blocks - 1


def test_pool_offload_restore_token_exact(params):
    """offload_pool()/restore_pool() (GRPO rollout->update HBM handoff): pages
    swap to host between serving phases and the engine resumes with prefix
    hits intact and token-exact output."""
    rng = np.random.default_rng(23)
    shared = rng.integers(0, 120, (1, 64)).astype(np.int32)
    prompts = [shared, rng.integers(0, 120, (1, 73)).astype(np.int32)]
    _, plain = _run(params, 64, prompts, prefix_cache=True)

    eng, first = _run(params, 64, prompts, prefix_cache=True)
    assert first == plain
    eng.offload_pool()
    assert eng.cache is None                    # HBM pool actually released
    eng.restore_pool()
    # phase 2: the shared prompt must hit the prefix store pages that lived
    # through the host round-trip
    hits0 = eng.store.hits
    eng.submit(Request(request_id="again", ids=shared.copy(), max_new_tokens=48))
    out = eng.run_until_done()
    assert out["again"] == plain["r0"]
    assert eng.store.hits > hits0
