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
