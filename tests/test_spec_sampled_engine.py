"""SAMPLED (Leviathan) speculative decoding in the batched engines.

The batch-1 loop (runtime/speculative.generate_speculative_sampled) carries the
analytic law tests; here the BATCHED engine chunks (decode_spec_chunk_sampled /
paged_decode_spec_chunk_sampled) are gated on:
- the greedy limit (temperature -> 0, top_k=1): sampled spec == plain greedy
  target decoding token-exactly, slot and paged;
- per-seed determinism;
- the emitted-token marginal law == the warped target distribution (Monte
  Carlo over seeds, chunk-level — the engines' first token is emitted at
  admission by the normal sampling machinery, so the chunk's FIRST emission is
  the second generated token);
- EOS/row bookkeeping mechanics via full engine runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
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
DRAFT_CFG = Qwen2Config(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_layers=1, num_heads=4, num_kv_heads=2,
                        tie_word_embeddings=True)
GREEDY_LIMIT = SamplingParams(greedy=False, temperature=1e-4, top_k=1)


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def draft_params():
    return qwen2.init(jax.random.PRNGKey(7), DRAFT_CFG)


def _greedy_reference(params, ids, max_new):
    tokens, lengths = gen.generate(params, CFG, jnp.asarray(ids), None,
                                   max_new_tokens=max_new, eos_token_id=EOS,
                                   sampling=SamplingParams(greedy=True),
                                   capacity=256, compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


def test_slot_sampled_spec_greedy_limit(params, draft_params):
    """top_k=1 + tiny temperature warps both distributions to one-hot argmax:
    every acceptance/resample is deterministic and the engine must equal plain
    greedy target decoding exactly."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 120, size=(1, 5 + i)).astype(np.int32)
               for i in range(3)]
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                         eos_token_id=EOS, sampling=GREEDY_LIMIT,
                         compute_dtype=jnp.float32,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG,
                         spec_k=3, spec_rounds=2)
    assert engine._spec_sampled()
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=10))
    results = engine.run_until_done()
    for i, p in enumerate(prompts):
        ref = _greedy_reference(params, p, 10)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_paged_sampled_spec_greedy_limit(params, draft_params):
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 120, size=(1, 4 + 2 * i)).astype(np.int32)
               for i in range(3)]
    engine = PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=32,
                         block_size=16, max_blocks_per_seq=8, chunk=4,
                         eos_token_id=EOS, sampling=GREEDY_LIMIT,
                         compute_dtype=jnp.float32, preempt=False,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG,
                         spec_k=2, spec_rounds=3)
    assert engine._spec_sampled()
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=10))
    results = engine.run_until_done()
    for i, p in enumerate(prompts):
        ref = _greedy_reference(params, p, 10)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_sampled_spec_deterministic_per_seed(params, draft_params):
    def run():
        engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                             eos_token_id=EOS,
                             sampling=SamplingParams(greedy=False,
                                                     temperature=0.9, top_p=0.95),
                             compute_dtype=jnp.float32, seed=3,
                             draft_params=draft_params, draft_cfg=DRAFT_CFG,
                             spec_k=3, spec_rounds=2)
        ids = np.arange(1, 7, dtype=np.int32)[None]
        engine.submit(Request(request_id="a", ids=ids, max_new_tokens=10))
        engine.submit(Request(request_id="b", ids=ids + 1, max_new_tokens=10))
        return engine.run_until_done()

    r1, r2 = run(), run()
    assert r1 == r2


def test_sampled_spec_chunk_marginal_law(params, draft_params):
    """The FIRST token emitted by decode_spec_chunk_sampled follows the warped
    target next-token law at the row's prefix (Monte Carlo over rngs) — the
    end-to-end batched analogue of test_speculative_sampled_first_token_marginal."""
    from audio_flamingo_tpu.runtime.engine import (decode_spec_chunk_sampled,
                                                   init_slot_cache,
                                                   draft_prefill_into_slot)
    from audio_flamingo_tpu.runtime.generate import prefill
    from audio_flamingo_tpu.runtime.speculative import _warped_probs

    sampling = SamplingParams(greedy=False, temperature=1.3, top_k=20)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 120, size=(1, 5)))
    sub, logits = prefill(params, CFG, ids, None, 64, jnp.float32)

    # the chunk starts from `tok` = a FIXED current token; the first emission's
    # law must be the warped target distribution given [ids, tok]
    tok0 = 7
    full = jnp.concatenate([ids, jnp.asarray([[tok0]], jnp.int32)], axis=1)
    t_logits = qwen2.logits_from_ids(params["lm"], CFG.lm, full)[:, -1]
    expected = np.asarray(_warped_probs(t_logits.astype(jnp.float32), sampling))[0]

    d0 = init_slot_cache(DRAFT_CFG, 1, 64, jnp.float32)
    d0 = draft_prefill_into_slot(draft_params, DRAFT_CFG, d0, 0, ids,
                                 slot_capacity=64, compute_dtype=jnp.float32)

    n = 400
    firsts = np.empty((n,), np.int64)
    for i in range(n):
        cache = init_slot_cache(CFG.lm, 1, 64, jnp.float32)
        cache = cache._replace(
            k=cache.k.at[:, 0:1].set(sub.k), v=cache.v.at[:, 0:1].set(sub.v),
            lengths=jnp.asarray([5], jnp.int32))
        _, _, _, _, _, _, out, valid = decode_spec_chunk_sampled(
            params, draft_params, CFG, DRAFT_CFG, cache,
            d0.k.copy(), d0.v.copy(),
            jnp.asarray([tok0], jnp.int32), jnp.zeros((1,), bool),
            jax.random.PRNGKey(1000 + i), k=2, rounds=1, eos_token_id=EOS,
            sampling=sampling, compute_dtype=jnp.float32)
        row = np.asarray(out)[0][np.asarray(valid)[0]]
        assert len(row) >= 1
        firsts[i] = row[0]
    emp = np.bincount(firsts, minlength=128) / n
    tv = 0.5 * np.abs(emp - expected).sum()
    assert tv < 0.15, tv


# ---- smaller draft vocab (the real released pair: 0.5B 151936 vs 7B 152064) ----

SMALL_DRAFT_CFG = Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                              num_layers=1, num_heads=4, num_kv_heads=2,
                              tie_word_embeddings=True)


@pytest.fixture(scope="module")
def small_draft_params():
    return qwen2.init(jax.random.PRNGKey(9), SMALL_DRAFT_CFG)


def test_pad_draft_probs_shapes():
    from audio_flamingo_tpu.runtime.speculative import pad_draft_probs

    p = jnp.ones((2, 96)) / 96.0
    out = pad_draft_probs(p, 128)
    assert out.shape == (2, 128)
    assert float(out[:, 96:].sum()) == 0.0
    assert pad_draft_probs(p, 96) is p
    with pytest.raises(ValueError):
        pad_draft_probs(jnp.ones((2, 130)), 128)


def test_sampled_spec_smaller_draft_vocab_greedy_limit(params, small_draft_params):
    """A draft with FEWER vocab rows than the target (the released Qwen2.5
    pair genuinely differs) must still emit exactly the target's tokens in the
    deterministic greedy limit — q = 0 beyond the draft vocab routes
    target-only tokens through the residual resample."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 120, size=(1, 5 + i)).astype(np.int32)
               for i in range(3)]
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                         eos_token_id=EOS, sampling=GREEDY_LIMIT,
                         compute_dtype=jnp.float32,
                         draft_params=small_draft_params,
                         draft_cfg=SMALL_DRAFT_CFG, spec_k=3, spec_rounds=2)
    assert engine._spec_sampled()
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=10))
    results = engine.run_until_done()
    for i, p in enumerate(prompts):
        ref = _greedy_reference(params, p, 10)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_sampled_spec_smaller_draft_vocab_marginal_law(params, small_draft_params):
    """The chunk's first emitted token must follow the warped TARGET law even
    when the draft cannot express tokens >= its vocab (zero-padded q)."""
    from audio_flamingo_tpu.runtime.engine import (decode_spec_chunk_sampled,
                                                   init_slot_cache,
                                                   draft_prefill_into_slot)
    from audio_flamingo_tpu.runtime.generate import prefill
    from audio_flamingo_tpu.runtime.speculative import _warped_probs

    sampling = SamplingParams(greedy=False, temperature=1.3, top_k=20)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 90, size=(1, 5)))
    sub, _ = prefill(params, CFG, ids, None, 64, jnp.float32)

    tok0 = 7
    full = jnp.concatenate([ids, jnp.asarray([[tok0]], jnp.int32)], axis=1)
    t_logits = qwen2.logits_from_ids(params["lm"], CFG.lm, full)[:, -1]
    expected = np.asarray(_warped_probs(t_logits.astype(jnp.float32), sampling))[0]

    d0 = init_slot_cache(SMALL_DRAFT_CFG, 1, 64, jnp.float32)
    d0 = draft_prefill_into_slot(small_draft_params, SMALL_DRAFT_CFG, d0, 0, ids,
                                 slot_capacity=64, compute_dtype=jnp.float32)

    n = 400
    firsts = np.empty((n,), np.int64)
    for i in range(n):
        cache = init_slot_cache(CFG.lm, 1, 64, jnp.float32)
        cache = cache._replace(
            k=cache.k.at[:, 0:1].set(sub.k), v=cache.v.at[:, 0:1].set(sub.v),
            lengths=jnp.asarray([5], jnp.int32))
        _, _, _, _, _, _, out, valid = decode_spec_chunk_sampled(
            params, small_draft_params, CFG, SMALL_DRAFT_CFG, cache,
            d0.k.copy(), d0.v.copy(),
            jnp.asarray([tok0], jnp.int32), jnp.zeros((1,), bool),
            jax.random.PRNGKey(2000 + i), k=2, rounds=1, eos_token_id=EOS,
            sampling=sampling, compute_dtype=jnp.float32)
        row = np.asarray(out)[0][np.asarray(valid)[0]]
        assert len(row) >= 1
        firsts[i] = row[0]
    emp = np.bincount(firsts, minlength=128) / n
    tv = 0.5 * np.abs(emp - expected).sum()
    assert tv < 0.15, tv
