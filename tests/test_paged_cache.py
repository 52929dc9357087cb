"""Paged KV cache tests: decode through pages == contiguous-cache decode; allocator;
non-contiguous block tables; prefill installation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import Qwen2Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.runtime.paged_cache import (
    BlockAllocator,
    PagedKV,
    init_paged,
    paged_decode_step,
    paged_install_prefill,
)

jax.config.update("jax_default_matmul_precision", "highest")

CFG = Qwen2Config(vocab_size=96, hidden_size=48, intermediate_size=96, num_layers=2,
                  num_heads=4, num_kv_heads=2, tie_word_embeddings=True)
BLOCK = 8
MAX_BLOCKS = 4  # 32 logical positions per row


@pytest.fixture(scope="module")
def params():
    return qwen2.init(jax.random.PRNGKey(0), CFG)


def test_allocator_reuse():
    a = BlockAllocator(num_blocks=6)
    x = a.alloc(4)
    assert len(set(x)) == 4
    a.release(x[:2])
    y = a.alloc(3)
    assert len(set(y)) == 3
    with pytest.raises(MemoryError):
        a.alloc(10)


def test_paged_decode_matches_contiguous(params):
    """Greedy chain through SHUFFLED pages == contiguous static-cache chain."""
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 96, (1, 6)))

    # reference: contiguous cache decode
    ref_cache = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
    x = qwen2.embed(params, prompt)
    h, ref_cache = qwen2.forward(params, CFG, x, jnp.arange(6)[None], cache=ref_cache)
    tok = int(jnp.argmax(qwen2.unembed(params, CFG, h[:, -1])))
    ref_chain = [tok]
    for t in range(6, 16):
        x = qwen2.embed(params, jnp.asarray([[tok]]))
        h, ref_cache = qwen2.forward(params, CFG, x, jnp.asarray([[t]]), cache=ref_cache)
        tok = int(jnp.argmax(qwen2.unembed(params, CFG, h[:, 0])))
        ref_chain.append(tok)

    # paged: prefill into a deliberately NON-contiguous block table
    alloc = BlockAllocator(num_blocks=16)
    _ = alloc.alloc(3)  # burn a few blocks so the table isn't 0..3
    table = np.asarray(alloc.alloc(MAX_BLOCKS), np.int32)
    np.random.default_rng(1).shuffle(table)

    pre_cache = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
    x = qwen2.embed(params, prompt)
    h, pre_cache = qwen2.forward(params, CFG, x, jnp.arange(6)[None], cache=pre_cache)
    first = int(jnp.argmax(qwen2.unembed(params, CFG, h[:, -1])))

    paged = init_paged(CFG, batch=1, num_blocks=16, block_size=BLOCK,
                       max_blocks_per_seq=MAX_BLOCKS, dtype=jnp.float32)
    paged = paged_install_prefill(paged, jnp.asarray(0), pre_cache.k, pre_cache.v,
                                  jnp.asarray(table), jnp.asarray(6), CFG,
                                  compute_dtype=jnp.float32)
    chain = [first]
    tok_arr = jnp.asarray([first])
    for _ in range(10):
        paged, logits = paged_decode_step(params, CFG, paged, tok_arr,
                                          compute_dtype=jnp.float32)
        tok_arr = jnp.argmax(logits, -1).astype(jnp.int32)
        chain.append(int(tok_arr[0]))
    assert chain == ref_chain, (chain, ref_chain)


def test_paged_rows_isolated(params):
    """Two rows with different tables/lengths decode independently."""
    rng = np.random.default_rng(2)
    paged = init_paged(CFG, batch=2, num_blocks=16, block_size=BLOCK,
                       max_blocks_per_seq=MAX_BLOCKS, dtype=jnp.float32)
    alloc = BlockAllocator(num_blocks=16)

    def prefill_row(paged, row, ids):
        cache = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
        x = qwen2.embed(params, ids)
        h, cache = qwen2.forward(params, CFG, x,
                                 jnp.arange(ids.shape[1])[None], cache=cache)
        table = np.asarray(alloc.alloc(MAX_BLOCKS), np.int32)
        paged = paged_install_prefill(paged, jnp.asarray(row), cache.k, cache.v,
                                      jnp.asarray(table), jnp.asarray(ids.shape[1]),
                                      CFG, compute_dtype=jnp.float32)
        first = int(jnp.argmax(qwen2.unembed(params, CFG, h[:, -1])))
        return paged, first

    a = jnp.asarray(rng.integers(0, 96, (1, 5)))
    b = jnp.asarray(rng.integers(0, 96, (1, 9)))
    paged, fa = prefill_row(paged, 0, a)
    paged, fb = prefill_row(paged, 1, b)

    # row-0-only reference with its own paged cache
    solo = init_paged(CFG, batch=1, num_blocks=16, block_size=BLOCK,
                      max_blocks_per_seq=MAX_BLOCKS, dtype=jnp.float32)
    alloc2 = BlockAllocator(num_blocks=16)
    cache = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
    x = qwen2.embed(params, a)
    h, cache = qwen2.forward(params, CFG, x, jnp.arange(5)[None], cache=cache)
    solo = paged_install_prefill(solo, jnp.asarray(0), cache.k, cache.v,
                                 jnp.asarray(np.asarray(alloc2.alloc(MAX_BLOCKS),
                                                        np.int32)),
                                 jnp.asarray(5), CFG, compute_dtype=jnp.float32)

    toks = jnp.asarray([fa, fb])
    solo_tok = jnp.asarray([fa])
    for _ in range(6):
        paged, logits2 = paged_decode_step(params, CFG, paged, toks,
                                           compute_dtype=jnp.float32)
        solo, logits1 = paged_decode_step(params, CFG, solo, solo_tok,
                                          compute_dtype=jnp.float32)
        toks = jnp.argmax(logits2, -1).astype(jnp.int32)
        solo_tok = jnp.argmax(logits1, -1).astype(jnp.int32)
        assert int(toks[0]) == int(solo_tok[0])


def test_paged_engine_matches_single_request():
    """PagedEngine greedy output == single-request generate; pages reused across reqs."""
    from audio_flamingo_tpu.config import AF3Config, WhisperEncoderConfig
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.runtime import generate as gen
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    acfg = AF3Config(
        encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1,
                                     num_heads=4, ffn_dim=64, max_source_positions=12),
        lm=CFG, audio_token_id=90)
    params = af3.init(jax.random.PRNGKey(1), acfg)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 90, size=(1, 4 + i)).astype(np.int32) for i in range(5)]

    engine = PagedEngine(params=params, cfg=acfg, num_rows=2, num_blocks=12,
                         block_size=BLOCK, max_blocks_per_seq=MAX_BLOCKS, chunk=4,
                         eos_token_id=127, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"p{i}", ids=p, max_new_tokens=10))
    results = engine.run_until_done()
    assert set(results) == {f"p{i}" for i in range(5)}
    # pool fully released at the end (block 0 reserved as the trash page)
    assert len(engine.allocator.free) == 11
    for i, p in enumerate(prompts):
        ref, ref_len = gen.generate(params, acfg, jnp.asarray(p), None,
                                    max_new_tokens=10, eos_token_id=127,
                                    sampling=SamplingParams(greedy=True),
                                    capacity=MAX_BLOCKS * BLOCK,
                                    compute_dtype=jnp.float32)
        r = [int(t) for t in np.asarray(ref)[0][: int(ref_len[0])]]
        got = results[f"p{i}"]
        n = min(len(r), len(got))
        assert got[:n] == r[:n], (i, got, r)


# ---------------------------------------------------------------- pallas paged kernel

def test_paged_attention_kernel_matches_reference():
    """Pallas paged-attention kernel (block-table reads, online softmax) == XLA
    dense-gather reference, including rows with partial last pages and len=0."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        merge_current_token, paged_attention, paged_attention_reference)

    rng = np.random.default_rng(0)
    L, num_blocks, block, nkv, hd = 3, 16, 128, 2, 128
    B, g = 4, 3
    max_pages = 6
    k_pool = jnp.asarray(rng.normal(size=(L, num_blocks, block, nkv, hd)), jnp.float32)
    v_pool = jnp.asarray(rng.normal(size=(L, num_blocks, block, nkv, hd)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, nkv, g, hd)), jnp.float32)
    # rows: empty, one partial page, several full + partial, all pages full
    lengths = jnp.asarray([0, 70, 300, max_pages * block], jnp.int32)
    tables = np.full((B, max_pages), -1, np.int32)
    pool_ids = rng.permutation(np.arange(1, num_blocks))
    ptr = 0
    for b in range(B):
        n = int(np.ceil(int(lengths[b]) / block))
        tables[b, :n] = pool_ids[ptr: ptr + n]
        ptr += n
    tables = jnp.asarray(tables)

    for layer in range(L):
        o, m, l = paged_attention(q, k_pool, v_pool, tables, lengths,
                                  jnp.asarray(layer))
        o_r, m_r, l_r = paged_attention_reference(q, k_pool, v_pool, tables, lengths,
                                                  jnp.asarray(layer))
        # normalized outputs must agree on rows with content
        got = np.asarray(o / np.maximum(np.asarray(l)[..., None], 1e-30))
        want = np.asarray(o_r / np.maximum(np.asarray(l_r)[..., None], 1e-30))
        np.testing.assert_allclose(got[1:], want[1:], atol=1e-5, rtol=1e-5)
        # merged with a current token, every row (incl. len=0) must be finite and match
        k_cur = jnp.asarray(rng.normal(size=(B, nkv, hd)), jnp.float32)
        v_cur = jnp.asarray(rng.normal(size=(B, nkv, hd)), jnp.float32)
        full = merge_current_token(q, k_cur, v_cur, o, m, l)
        full_r = merge_current_token(q, k_cur, v_cur, o_r, m_r, l_r)
        np.testing.assert_allclose(np.asarray(full), np.asarray(full_r),
                                   atol=1e-5, rtol=1e-5)
        assert np.isfinite(np.asarray(full)).all()


def test_merge_current_token_equals_full_attention():
    """paged kernel + current-token merge == ordinary causal attention over the same
    sequence laid out contiguously."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        merge_current_token, paged_attention)

    rng = np.random.default_rng(1)
    block, nkv, g, hd = 128, 2, 2, 128
    T = 200                                # context already in pages
    num_blocks, max_pages = 8, 4
    # build a pool holding the sequence in shuffled pages
    k_seq = rng.normal(size=(T, nkv, hd)).astype(np.float32)
    v_seq = rng.normal(size=(T, nkv, hd)).astype(np.float32)
    n = int(np.ceil(T / block))
    table = rng.permutation(np.arange(1, num_blocks))[:n]
    k_pool = np.zeros((1, num_blocks, block, nkv, hd), np.float32)
    v_pool = np.zeros((1, num_blocks, block, nkv, hd), np.float32)
    pad = n * block - T
    k_pad = np.concatenate([k_seq, np.zeros((pad, nkv, hd), np.float32)])
    v_pad = np.concatenate([v_seq, np.zeros((pad, nkv, hd), np.float32)])
    k_pool[0, table] = k_pad.reshape(n, block, nkv, hd)
    v_pool[0, table] = v_pad.reshape(n, block, nkv, hd)
    tables = np.full((1, max_pages), -1, np.int32)
    tables[0, :n] = table

    q = rng.normal(size=(1, nkv, g, hd)).astype(np.float32)
    k_cur = rng.normal(size=(1, nkv, hd)).astype(np.float32)
    v_cur = rng.normal(size=(1, nkv, hd)).astype(np.float32)

    o, m, l = paged_attention(jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
                              jnp.asarray(tables), jnp.asarray([T], jnp.int32),
                              jnp.asarray(0))
    got = np.asarray(merge_current_token(jnp.asarray(q), jnp.asarray(k_cur),
                                         jnp.asarray(v_cur), o, m, l))[0]

    # reference: plain softmax attention over [k_seq; k_cur]
    ks = np.concatenate([k_seq, k_cur[0][None]], axis=0)     # [T+1, nkv, hd]
    vs = np.concatenate([v_seq, v_cur[0][None]], axis=0)
    s = np.einsum("kgd,tkd->kgt", q[0], ks) * (hd ** -0.5)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("kgt,tkd->kgd", p, vs)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_paged_engine_lazy_growth_beats_worst_case_reservation():
    """Rows admit with bucket-sized page maps and GROW as they decode: a pool smaller
    than rows x max_blocks_per_seq still serves long generations correctly (the round-1
    engine reserved the worst case up front and could not admit here at all)."""
    from audio_flamingo_tpu.config import AF3Config, WhisperEncoderConfig
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.runtime import generate as gen
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    acfg = AF3Config(
        encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1,
                                     num_heads=4, ffn_dim=64, max_source_positions=12),
        lm=CFG, audio_token_id=90)
    params = af3.init(jax.random.PRNGKey(2), acfg)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 90, size=(1, 5 + i)).astype(np.int32) for i in range(2)]

    # worst case would need 2 rows x 16 blocks = 32; pool has only 11 usable pages.
    # prompt bucket = 128 tokens = 4 pages; 160-token contexts need ceil(165/32)=6.
    engine = PagedEngine(params=params, cfg=acfg, num_rows=2, num_blocks=12,
                         block_size=32, max_blocks_per_seq=16, chunk=8,
                         eos_token_id=127, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"p{i}", ids=p, max_new_tokens=40))
    results = engine.run_until_done()
    assert set(results) == {"p0", "p1"}
    assert len(engine.allocator.free) == 11  # everything released
    for i, p in enumerate(prompts):
        ref, ref_len = gen.generate(params, acfg, jnp.asarray(p), None,
                                    max_new_tokens=40, eos_token_id=127,
                                    sampling=SamplingParams(greedy=True),
                                    capacity=512, compute_dtype=jnp.float32)
        r = [int(t) for t in np.asarray(ref)[0][: int(ref_len[0])]]
        got = results[f"p{i}"]
        n = min(len(r), len(got))
        assert got[:n] == r[:n], (i, got, r)


def test_paged_engine_pool_exhaustion_evicts_gracefully():
    """When the pool starves, growing rows finish early with what they have; other
    rows are unaffected and remain exact; every page is released afterwards."""
    from audio_flamingo_tpu.config import AF3Config, WhisperEncoderConfig
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.runtime import generate as gen
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    acfg = AF3Config(
        encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1,
                                     num_heads=4, ffn_dim=64, max_source_positions=12),
        lm=CFG, audio_token_id=90)
    params = af3.init(jax.random.PRNGKey(1), acfg)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 90, size=(1, 6)).astype(np.int32) for _ in range(3)]

    # pool of 5 usable pages, 3 rows wanting 2+ pages each: someone must starve
    engine = PagedEngine(params=params, cfg=acfg, num_rows=3, num_blocks=6,
                         block_size=BLOCK, max_blocks_per_seq=MAX_BLOCKS, chunk=4,
                         eos_token_id=127, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"p{i}", ids=p,
                              max_new_tokens=3 * BLOCK))  # wants to outgrow the pool
    results = engine.run_until_done()
    # every request finished (some evicted early), nothing crashed, pool restored
    assert set(results) == {f"p{i}" for i in range(3)}
    assert all(len(v) >= 1 for v in results.values())
    assert len(engine.allocator.free) == 5
    # emitted prefixes are exact vs single-request decode
    for i, p in enumerate(prompts):
        ref, ref_len = gen.generate(params, acfg, jnp.asarray(p), None,
                                    max_new_tokens=3 * BLOCK, eos_token_id=127,
                                    sampling=SamplingParams(greedy=True),
                                    capacity=MAX_BLOCKS * BLOCK,
                                    compute_dtype=jnp.float32)
        r = [int(t) for t in np.asarray(ref)[0][: int(ref_len[0])]]
        got = results[f"p{i}"]
        n = min(len(r), len(got))
        assert got[:n] == r[:n], (i, got, r)


# ---------------------------------------------------------------- int8 page pool

def test_paged_attention_kernel_int8_matches_reference():
    """int8 pool + per-token scales: kernel == dequantized dense-gather reference."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        paged_attention, paged_attention_reference)

    rng = np.random.default_rng(7)
    L, num_blocks, block, nkv, hd = 2, 12, 128, 2, 128
    B, g, max_pages = 3, 3, 4
    kq = rng.integers(-127, 128, size=(L, num_blocks, block, nkv, hd)).astype(np.int8)
    vq = rng.integers(-127, 128, size=(L, num_blocks, block, nkv, hd)).astype(np.int8)
    ks = rng.uniform(0.001, 0.02, size=(L, num_blocks, block, nkv)).astype(np.float32)
    vs = rng.uniform(0.001, 0.02, size=(L, num_blocks, block, nkv)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, nkv, g, hd)), jnp.float32)
    lengths = jnp.asarray([70, 300, max_pages * block], jnp.int32)
    tables = np.full((B, max_pages), -1, np.int32)
    ids = rng.permutation(np.arange(1, num_blocks))
    ptr = 0
    for b in range(B):
        n = int(np.ceil(int(lengths[b]) / block))
        tables[b, :n] = ids[ptr: ptr + n]
        ptr += n
    args = (q, jnp.asarray(kq), jnp.asarray(vq), jnp.asarray(tables), lengths,
            jnp.asarray(1))
    kw = dict(k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
    o, m, l = paged_attention(*args, **kw)
    o_r, m_r, l_r = paged_attention_reference(*args, **kw)
    got = np.asarray(o / np.maximum(np.asarray(l)[..., None], 1e-30))
    want = np.asarray(o_r / np.maximum(np.asarray(l_r)[..., None], 1e-30))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_paged_q8_decode_matches_dense_q8_cache():
    """int8 paged decode == the dense Q8KVCache decode path (same quantization
    scheme, so greedy tokens agree and logits stay close)."""
    params = qwen2.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(8)
    t = 12
    ids = jnp.asarray(rng.integers(0, 90, (1, t)), jnp.int32)

    # dense q8 reference: prefill + single-token decode over Q8KVCache
    dense = qwen2.init_cache_q8(CFG, 1, MAX_BLOCKS * BLOCK)
    embeds = qwen2.embed(params, ids, dtype=jnp.float32)
    pos = jnp.arange(t)[None]
    h, dense = qwen2.forward(params, CFG, embeds, pos, cache=dense, is_prefill=True)
    ref_tok = jnp.argmax(qwen2.unembed(params, CFG, h[:, -1]), -1).astype(jnp.int32)

    # paged q8: same prefill installed into shuffled pages
    from audio_flamingo_tpu.runtime.paged_cache import (
        init_paged, paged_decode_step, paged_install_pages)

    bf16_sub = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
    _, bf16_sub = qwen2.forward(params, CFG, embeds, pos, cache=bf16_sub,
                                is_prefill=True)
    paged = init_paged(CFG, 1, 12, BLOCK, MAX_BLOCKS, dtype=jnp.int8)
    page_ids = jnp.asarray(rng.permutation(np.arange(1, 12))[:MAX_BLOCKS], jnp.int32)
    paged = paged_install_pages(paged, bf16_sub.k, bf16_sub.v, page_ids, CFG,
                                compute_dtype=jnp.float32)
    tables = np.full((1, MAX_BLOCKS), -1, np.int32)
    tables[0] = np.asarray(page_ids)
    paged = paged._replace(block_tables=jnp.asarray(tables),
                           lengths=jnp.asarray([t], jnp.int32))

    tok_p = ref_tok
    tok_d = ref_tok
    for step in range(6):
        paged, logits_p = paged_decode_step(params, CFG, paged, tok_p,
                                            compute_dtype=jnp.float32)
        x = qwen2.embed(params, tok_d[:, None], dtype=jnp.float32)
        pos_d = jnp.full((1, 1), dense.index, jnp.int32)
        h, dense = qwen2.forward(params, CFG, x, pos_d, cache=dense)
        logits_d = qwen2.unembed(params, CFG, h[:, 0])
        np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_d),
                                   atol=2e-3, rtol=2e-3)
        tok_p = jnp.argmax(logits_p, -1).astype(jnp.int32)
        tok_d = jnp.argmax(logits_d, -1).astype(jnp.int32)
        assert int(tok_p[0]) == int(tok_d[0]), step


def test_paged_engine_int8_pool():
    """PagedEngine(kv_dtype=int8) serves requests end-to-end; output matches the
    bf16 paged engine closely (greedy tokens may diverge only after many steps)."""
    from audio_flamingo_tpu.config import AF3Config, WhisperEncoderConfig
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    acfg = AF3Config(
        encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1,
                                     num_heads=4, ffn_dim=64, max_source_positions=12),
        lm=CFG, audio_token_id=90)
    params = af3.init(jax.random.PRNGKey(1), acfg)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 90, size=(1, 5 + i)).astype(np.int32) for i in range(3)]

    def run(kv_dtype):
        eng = PagedEngine(params=params, cfg=acfg, num_rows=2, num_blocks=12,
                          block_size=BLOCK, max_blocks_per_seq=MAX_BLOCKS, chunk=4,
                          eos_token_id=127, sampling=SamplingParams(greedy=True),
                          compute_dtype=jnp.float32, kv_dtype=kv_dtype)
        for i, p in enumerate(prompts):
            eng.submit(Request(request_id=f"p{i}", ids=p, max_new_tokens=8))
        return eng.run_until_done()

    r_bf16 = run(None)
    r_q8 = run(jnp.int8)
    assert set(r_q8) == set(r_bf16)
    for k in r_bf16:
        a, b = r_q8[k], r_bf16[k]
        n = min(len(a), len(b), 4)   # early tokens robust to quantization noise
        assert a[:n] == b[:n], (k, a, b)


def test_paged_install_prefill_int8(params):
    """paged_install_prefill on an int8 pool must quantize + carry scales
    (review finding: it previously cast bf16 KV straight to int8 and dropped
    the scale arrays)."""
    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(0, 96, (1, 6)))
    pre = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
    x = qwen2.embed(params, prompt)
    h, pre = qwen2.forward(params, CFG, x, jnp.arange(6)[None], cache=pre)
    first = int(jnp.argmax(qwen2.unembed(params, CFG, h[:, -1])))

    paged = init_paged(CFG, batch=1, num_blocks=16, block_size=BLOCK,
                       max_blocks_per_seq=MAX_BLOCKS, dtype=jnp.int8)
    table = jnp.asarray(np.arange(2, 2 + MAX_BLOCKS, dtype=np.int32))
    paged = paged_install_prefill(paged, jnp.asarray(0), pre.k, pre.v,
                                  table, jnp.asarray(6), CFG,
                                  compute_dtype=jnp.float32)
    assert paged.k_scale is not None
    written = np.asarray(paged.k_scale)[:, np.asarray(table)]
    assert np.all(written != 1.0)   # real per-token scales, not the init value

    # greedy decode through the int8 pages matches the fp32 reference closely
    ref_cache = qwen2.init_cache(CFG, 1, MAX_BLOCKS * BLOCK, dtype=jnp.float32)
    _, ref_cache = qwen2.forward(params, CFG, x, jnp.arange(6)[None], cache=ref_cache)
    tok = jnp.asarray([first])
    ref_tok = first
    for t in range(6, 10):
        paged, logits = paged_decode_step(params, CFG, paged, tok,
                                          compute_dtype=jnp.float32)
        xr = qwen2.embed(params, jnp.asarray([[ref_tok]]))
        hr, ref_cache = qwen2.forward(params, CFG, xr, jnp.asarray([[t]]),
                                      cache=ref_cache)
        ref_logits = qwen2.unembed(params, CFG, hr[:, 0])
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                                   atol=0.05, rtol=0.05)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_tok = int(jnp.argmax(ref_logits))


def test_paged_attention_stacked_prefetch_matches_sliced():
    """The stacked-pool path (layer index resolved INSIDE the kernel's BlockSpec
    maps via scalar prefetch — the scan-invariant-pool design, VERDICT r3 #6)
    must equal calling the kernel on an externally-sliced one-layer pool."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import paged_attention

    rng = np.random.default_rng(7)
    L, num_blocks, block, nkv, hd = 4, 12, 64, 2, 128
    B, g, max_pages = 3, 3, 5
    k_pool = jnp.asarray(rng.normal(size=(L, num_blocks, block, nkv, hd)), jnp.float32)
    v_pool = jnp.asarray(rng.normal(size=(L, num_blocks, block, nkv, hd)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, nkv, g, hd)), jnp.float32)
    lengths = jnp.asarray([50, 200, max_pages * block], jnp.int32)
    tables = np.full((B, max_pages), -1, np.int32)
    ids = rng.permutation(np.arange(1, num_blocks))
    ptr = 0
    for b in range(B):
        n = int(np.ceil(int(lengths[b]) / block))
        tables[b, :n] = ids[ptr: ptr + n]
        ptr += n
    tables = jnp.asarray(tables)

    for layer in (0, 2, 3):
        o_s, m_s, l_s = paged_attention(q, k_pool, v_pool, tables, lengths,
                                        jnp.asarray(layer))
        o_1, m_1, l_1 = paged_attention(q, k_pool[layer], v_pool[layer],
                                        tables, lengths)
        np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_1),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_1), atol=1e-6)
