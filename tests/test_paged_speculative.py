"""Speculative decoding on the PAGED engine (paged_decode_spec_chunk).

Exactness contract mirrors tests/test_engine_speculative.py: with any draft,
the paged engine's greedy output equals target-only greedy decoding token for
token — perfect draft (the target) exercises the all-accept path; an
independent random draft exercises per-row rejection/rollback through pages;
the int8 pool composes. Also golden-tests the building blocks:
merge_block_tokens (S-token in-flight causal merge) against a dense reference,
and paged_verify_step against chained single-token paged_decode_steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.engine import Request
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


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def draft_params():
    return qwen2.init(jax.random.PRNGKey(7), DRAFT_CFG)


def test_merge_block_tokens_matches_dense():
    """S-token in-flight merge == dense attention over [past ++ causal block]."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        merge_block_tokens, paged_attention_reference)

    b, s, nkv, g, hd = 2, 3, 2, 2, 8
    block, n_blocks, max_pages = 4, 6, 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, nkv, g, hd)), jnp.float32)
    k_pool = jnp.asarray(rng.normal(size=(n_blocks, block, nkv, hd)), jnp.float32)
    v_pool = jnp.asarray(rng.normal(size=(n_blocks, block, nkv, hd)), jnp.float32)
    tables = jnp.asarray([[1, 2, -1, -1], [3, 4, 5, -1]], jnp.int32)
    lengths = jnp.asarray([6, 9], jnp.int32)
    k_blk = jnp.asarray(rng.normal(size=(b, s, nkv, hd)), jnp.float32)
    v_blk = jnp.asarray(rng.normal(size=(b, s, nkv, hd)), jnp.float32)

    qf = q.transpose(0, 2, 1, 3, 4).reshape(b, nkv, s * g, hd)
    o, m, l = paged_attention_reference(qf, k_pool, v_pool, tables, lengths)
    o = o.reshape(b, nkv, s, g, hd).transpose(0, 2, 1, 3, 4)
    m = m.reshape(b, nkv, s, g).transpose(0, 2, 1, 3)
    l = l.reshape(b, nkv, s, g).transpose(0, 2, 1, 3)
    got = merge_block_tokens(q, k_blk, v_blk, o, m, l)

    # dense reference: gather the past, append the block, causal-mask, softmax
    scale = hd ** -0.5
    idx = jnp.maximum(tables, 0)
    k_seq = k_pool[idx].reshape(b, max_pages * block, nkv, hd)
    v_seq = v_pool[idx].reshape(b, max_pages * block, nkv, hd)
    t_past = max_pages * block
    for bi in range(b):
        for si in range(s):
            kk = jnp.concatenate([k_seq[bi], k_blk[bi, : si + 1]], axis=0)
            vv = jnp.concatenate([v_seq[bi], v_blk[bi, : si + 1]], axis=0)
            valid = jnp.concatenate([jnp.arange(t_past) < lengths[bi],
                                     jnp.ones((si + 1,), bool)])
            sc = jnp.einsum("kgd,tkd->kgt", q[bi, si], kk) * scale
            sc = jnp.where(valid[None, None, :], sc, -1e30)
            p = jax.nn.softmax(sc, axis=-1)
            want = jnp.einsum("kgt,tkd->kgd", p, vv)
            np.testing.assert_allclose(np.asarray(got[bi, si]), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv_dtype", [None, jnp.int8], ids=["bf16-pool", "q8-pool"])
def test_paged_verify_step_matches_chained_decode(params, kv_dtype):
    """Multi-token verify logits == k+1 chained single-token paged_decode_steps
    (same pools, same pages) — the numeric core of paged speculation."""
    from audio_flamingo_tpu.runtime.paged_cache import (init_paged,
                                                        paged_decode_step,
                                                        paged_verify_step)
    from audio_flamingo_tpu.runtime.generate import prefill

    lm, lcfg = params["lm"], CFG.lm
    bs = 8
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 120, (1, 8)), jnp.int32)
    sub, logits0 = prefill(params, CFG, ids, None, 16, jnp.float32)

    def fresh_cache():
        from audio_flamingo_tpu.runtime.paged_cache import paged_install_pages

        cache = init_paged(lcfg, 1, 8, bs, 6, kv_dtype or jnp.float32)
        cache = paged_install_pages(cache, sub.k, sub.v,
                                    jnp.asarray([1, 2], jnp.int32), lcfg,
                                    compute_dtype=jnp.float32)
        return cache._replace(
            block_tables=jnp.asarray([[1, 2, 3, 4, -1, -1]], jnp.int32),
            lengths=jnp.asarray([8], jnp.int32))

    toks = jnp.asarray(rng.integers(0, 120, (1, 3)), jnp.int32)

    # chained single-token decodes (lengths advance each step)
    cache_a = fresh_cache()
    chained = []
    for i in range(3):
        cache_a, lg = paged_decode_step(lm, lcfg, cache_a, toks[:, i],
                                        compute_dtype=jnp.float32)
        chained.append(lg)
    chained = jnp.stack(chained, axis=1)                     # [1, 3, vocab]

    cache_b = fresh_cache()
    cache_b, block = paged_verify_step(lm, lcfg, cache_b, toks,
                                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(block), np.asarray(chained),
                               rtol=2e-4, atol=2e-4)
    # verify wrote the same KV the chained path did (compare written positions)
    for pool_a, pool_b in ((cache_a.k, cache_b.k), (cache_a.v, cache_b.v)):
        np.testing.assert_allclose(np.asarray(pool_a), np.asarray(pool_b),
                                   rtol=1e-5, atol=1e-5)


def _run_paged(params, prompts, max_new, **kw):
    engine = PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=32,
                         block_size=16, max_blocks_per_seq=8, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, preempt=False, **kw)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p.astype(np.int32),
                              max_new_tokens=max_new))
    return engine.run_until_done()


def _check_vs_reference(params, prompts, results, max_new):
    for i, p in enumerate(prompts):
        tokens, lengths = gen.generate(params, CFG, jnp.asarray(p.astype(np.int32)),
                                       None, max_new_tokens=max_new,
                                       eos_token_id=EOS,
                                       sampling=SamplingParams(greedy=True),
                                       capacity=256, compute_dtype=jnp.float32)
        ref = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_paged_spec_perfect_draft(params):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 120, size=(1, 5 + i)) for i in range(3)]
    results = _run_paged(params, prompts, 12,
                         draft_params=params["lm"], draft_cfg=CFG.lm,
                         spec_k=3, spec_rounds=2)
    assert set(results) == {f"r{i}" for i in range(3)}
    _check_vs_reference(params, prompts, results, 12)


def test_paged_spec_random_draft(params, draft_params):
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 120, size=(1, 4 + 2 * i)) for i in range(3)]
    results = _run_paged(params, prompts, 10,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG,
                         spec_k=4, spec_rounds=2)
    _check_vs_reference(params, prompts, results, 10)


def test_paged_spec_int8_pool(params, draft_params):
    """Speculation composes with the int8 page pool: exact vs a PLAIN paged
    engine on the same int8 pool (the q8 quantization is the shared numeric
    base; rollback must not corrupt scales)."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 120, size=(1, 6)) for _ in range(2)]
    spec = _run_paged(params, prompts, 10,
                      draft_params=draft_params, draft_cfg=DRAFT_CFG,
                      spec_k=2, spec_rounds=3, kv_dtype=jnp.int8)
    plain = _run_paged(params, prompts, 10, kv_dtype=jnp.int8)
    for rid, toks in plain.items():
        got = spec[rid]
        n = min(len(got), len(toks))
        assert got[:n] == toks[:n], (rid, got, toks)


def test_paged_spec_accept_sim_harness(params, draft_params):
    """Bernoulli-injection measurement mode on the paged engine: mechanics only."""
    for a in (1.0, 0.0):
        engine = PagedEngine(params=params, cfg=CFG, num_rows=1, num_blocks=32,
                             block_size=16, max_blocks_per_seq=8, chunk=4,
                             eos_token_id=EOS,
                             sampling=SamplingParams(greedy=True),
                             compute_dtype=jnp.float32, preempt=False,
                             draft_params=draft_params, draft_cfg=DRAFT_CFG,
                             spec_k=2, spec_rounds=2, spec_accept_sim=a)
        assert engine._speculating()
        engine.submit(Request(request_id="x",
                              ids=np.arange(1, 7, dtype=np.int32)[None],
                              max_new_tokens=9))
        results = engine.run_until_done(max_rounds=50)
        assert 1 <= len(results["x"]) <= 9


def test_paged_spec_composes_with_prefix_cache(params, draft_params):
    """Spec + automatic prefix caching: the draft prefills dense over the full
    ids while the target rides shared pages — output still exactly greedy, and
    the second same-prefix request actually hits the store."""
    rng = np.random.default_rng(5)
    shared = rng.integers(0, 120, size=(1, 32)).astype(np.int32)
    prompts = [shared, np.concatenate([shared[:, :32],
                                       rng.integers(0, 120, (1, 4)).astype(np.int32)],
                                      axis=1)]
    engine = PagedEngine(params=params, cfg=CFG, num_rows=1, num_blocks=32,
                         block_size=16, max_blocks_per_seq=8, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, preempt=False,
                         prefix_cache=True,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG,
                         spec_k=2, spec_rounds=2)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=8))
    results = engine.run_until_done()
    assert engine.store is not None and engine.store.entries  # store exercised
    _check_vs_reference(params, prompts, results, 8)


def test_paged_spec_composes_with_chunked_prefill(params, draft_params):
    """Spec + Sarathi-style chunked prefill: the draft prefill fires at chunked-
    prefill COMPLETION (activation), not admission — output exactly greedy."""
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, 120, size=(1, 40)).astype(np.int32),
               rng.integers(0, 120, size=(1, 6)).astype(np.int32)]
    engine = PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=32,
                         block_size=16, max_blocks_per_seq=8, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, preempt=False,
                         prefill_chunk=16,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG,
                         spec_k=2, spec_rounds=2)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=8))
    results = engine.run_until_done()
    _check_vs_reference(params, prompts, results, 8)


def test_paged_spec_fused_w4_target(params, draft_params):
    """Speculation over a fused-w4 (int4) target — the production decode combo.
    The multi-token verify takes the generic stacked path (the 2-call suffix
    kernels are s==1-only); exact vs the plain paged engine on the SAME w4 tree."""
    from audio_flamingo_tpu.ops.quant4 import quantize_lm_params_w4

    w4 = dict(params)
    w4["lm"] = quantize_lm_params_w4(params["lm"], group_size=8)
    assert "qkv" in w4["lm"]["layers"]
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 120, size=(1, 6)) for _ in range(2)]
    spec = _run_paged(w4, prompts, 10, draft_params=draft_params,
                      draft_cfg=DRAFT_CFG, spec_k=2, spec_rounds=2)
    plain = _run_paged(w4, prompts, 10)
    for rid, toks in plain.items():
        got = spec[rid]
        n = min(len(got), len(toks))
        assert got[:n] == toks[:n], (rid, got, toks)
