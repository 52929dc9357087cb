"""Pallas TPU paged-attention decode kernel: K/V read THROUGH the block table.

Round-1's paged path gathered ALL max_blocks pages per row per layer per step with
jnp.take (a dense [B, max_blocks*block, nkv, hd] temp), so per-step HBM traffic equaled
the contiguous slot cache. This kernel is the real thing (vLLM-style paged attention,
semantic model [hf] cache_utils.py:1031 StaticCache -> pages):

- grid (B, max_pages); at step (b, j) the BlockSpec index_map fetches physical page
  `tables[b, j]` of THIS layer straight from the [L, num_blocks, block, nkv, hd] pool —
  no XLA-level gather, no per-layer pool copy;
- pages past a row's length are CLAMPED to the row's last valid page: Pallas skips the
  DMA when the block index repeats, so per-row HBM traffic is ceil(len/block) pages,
  not max_blocks — short rows stop reading where their context ends;
- online softmax across that row's pages (m/l/acc resident in the revisited output
  blocks), normalized on the final grid step.

The kernel attends the PAGED context only (positions < lengths[b]). The current token's
(k, v) — not yet written to the pool — is merged by the caller with one more online-
softmax step (`merge_current_token`), keeping the pool write OUTSIDE the layer scan so
the decode step's donation structure stays simple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _dot_precision(dtype):
    """f32 callers pin HIGHEST or Mosaic demotes MXU dots to bf16 passes (CLAUDE.md
    rule 4); bf16 callers stay native."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _paged_kernel(*refs, block: int, max_pages: int, scale: float,
                  quantized: bool, stacked: bool):
    if stacked:
        tables_ref, len_ref, _layer_ref, q_ref, k_ref, v_ref, *rest = refs
    else:
        tables_ref, len_ref, q_ref, k_ref, v_ref, *rest = refs
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref = rest
    else:
        o_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    prec = _dot_precision(q_ref.dtype)
    nkv, g, hd = q_ref.shape[1:]

    @pl.when(j == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    kv_len = len_ref[b]
    num_pages = (kv_len + block - 1) // block

    @pl.when(j < num_pages)
    def _compute():
        # Mosaic cannot lower BATCHED tpu.matmul ("Bad lhs type" on hardware; the
        # batch axis only works in interpret mode), so the nkv axis is a static
        # Python unroll of plain 2D MXU dots — nkv is 4 for the AF3 LM, and decode
        # is HBM-bound on the page reads, not these small dots.
        q = q_ref[0]                                       # [nkv, g, hd]
        k = k_ref[0, 0] if stacked else k_ref[0]           # [block, nkv, hd]
        v = v_ref[0, 0] if stacked else v_ref[0]
        k_ids = j * block + jax.lax.broadcasted_iota(jnp.int32, (g, block), 1)
        for kv in range(nkv):
            kkv = k[:, kv, :]
            vkv = v[:, kv, :]
            if quantized:
                # int8 pages: dots run on the RAW int8 values (cast to the query
                # dtype); per-token dequant scales fold into the SMALL tensors —
                # score columns for K, probability columns for V — instead of
                # rescaling the [block, hd] tiles
                kkv = kkv.astype(q_ref.dtype)
                vkv = vkv.astype(q_ref.dtype)
            s = jax.lax.dot_general(
                q[kv], kkv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec) * scale  # [g, block]
            if quantized:
                ks_row = ks_ref[0, 0, :, kv] if stacked else ks_ref[0, :, kv]
                s = s * ks_row[None, :]
            s = jnp.where(k_ids < kv_len, s, NEG_INF)

            m_prev = m_ref[0, kv]                          # [g]
            l_prev = l_ref[0, kv]
            acc = o_ref[0, kv]                             # unnormalized [g, hd]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[:, None])
            alpha = jnp.exp(m_prev - m_new)
            if quantized:
                vs_row = vs_ref[0, 0, :, kv] if stacked else vs_ref[0, :, kv]
                pv = p * vs_row[None, :]
            else:
                pv = p
            upd = jax.lax.dot_general(
                pv.astype(q_ref.dtype), vkv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)   # [g, hd]
            o_ref[0, kv] = acc * alpha[:, None] + upd
            m_ref[0, kv] = m_new
            l_ref[0, kv] = l_prev * alpha + jnp.sum(p, axis=-1)


def paged_attention(q: jnp.ndarray, k_pool: jnp.ndarray, v_pool: jnp.ndarray,
                    block_tables: jnp.ndarray, lengths: jnp.ndarray,
                    layer_idx: jnp.ndarray | None = None, *,
                    k_scale: jnp.ndarray | None = None,
                    v_scale: jnp.ndarray | None = None,
                    scale: float | None = None):
    """Decode attention over paged KV for one layer.

    q:            [B, nkv, g, hd] one query token per row, GQA-grouped (head h of the
                  flat [H] layout maps to (h // g, h % g) — repeat_kv order).
    k/v_pool:     EITHER one layer's pool [num_blocks, block, nkv, hd] (layer_idx
                  unused), OR the stacked pool [L, num_blocks, block, nkv, hd] with
                  `layer_idx` resolved INSIDE the kernel: the index rides scalar
                  prefetch and the BlockSpec maps select (layer, page), so the
                  stacked pool is a loop-invariant operand and only the mapped
                  pages are DMA'd — slicing the layer outside (scan xs or
                  dynamic_index_in_dim) copies the layer's whole pool per call.
    block_tables: [B, max_pages] int32 physical page ids (-1 = unmapped).
    lengths:      [B] int32 tokens already in pages for each row (current token
                  excluded — merge it with merge_current_token).
    k/v_scale:    REQUIRED for int8 pools: per-token dequant scales
                  [num_blocks, block, nkv] (or [L, ...] stacked, sliced like the
                  pools). Pools stay int8 in HBM — half the page bytes per step.

    Returns (o, m, l): o [B, nkv, g, hd] f32 UNNORMALIZED accumulator; m, l [B, nkv, g]
    f32 online-softmax stats — feed to merge_current_token, or normalize as o/l.
    """
    stacked = k_pool.ndim == 5
    quantized = k_pool.dtype == jnp.int8
    assert not quantized or (k_scale is not None and v_scale is not None)
    bsz, nkv, g, hd = q.shape
    block = k_pool.shape[2] if stacked else k_pool.shape[1]
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = hd ** -0.5

    # clamp unmapped/past-length pages to the row's last valid page: a repeated block
    # index means Pallas skips the re-fetch, so per-row DMA == ceil(len/block) pages
    num_pages = jnp.maximum((lengths + block - 1) // block, 1)
    page_pos = jnp.minimum(jnp.arange(max_pages)[None], num_pages[:, None] - 1)
    phys = jnp.maximum(jnp.take_along_axis(block_tables, page_pos, axis=1), 0)

    kernel = functools.partial(_paged_kernel, block=block, max_pages=max_pages,
                               scale=scale, quantized=quantized, stacked=stacked)
    scalars = [phys.astype(jnp.int32), lengths.astype(jnp.int32)]
    if stacked:
        # the layer index rides SCALAR PREFETCH and is resolved inside the
        # BlockSpec index maps: the [L, ...] pool is a plain (loop-invariant)
        # operand and only this layer's mapped pages are ever DMA'd. Slicing
        # the layer OUTSIDE the kernel — whether by lax.scan over the pool or
        # dynamic_index_in_dim — materializes a fresh copy of the layer's
        # whole pool per layer per step (CLAUDE.md; measured ~0.65 GB/step at
        # the 7B mixed-workload shape, the paged-vs-slot bf16 gap).
        assert layer_idx is not None
        scalars.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))
        page_spec = pl.BlockSpec((1, 1, block, nkv, hd),
                                 lambda b, j, tr, nr, li: (li[0], tr[b, j], 0, 0, 0))
        q_spec = pl.BlockSpec((1, nkv, g, hd), lambda b, j, tr, nr, li: (b, 0, 0, 0))
        sc_spec = pl.BlockSpec((1, 1, block, nkv),
                               lambda b, j, tr, nr, li: (li[0], tr[b, j], 0, 0))
        out_specs = [
            pl.BlockSpec((1, nkv, g, hd), lambda b, j, tr, nr, li: (b, 0, 0, 0)),
            pl.BlockSpec((1, nkv, g), lambda b, j, tr, nr, li: (b, 0, 0)),
            pl.BlockSpec((1, nkv, g), lambda b, j, tr, nr, li: (b, 0, 0)),
        ]
    else:
        page_spec = pl.BlockSpec((1, block, nkv, hd),
                                 lambda b, j, tr, nr: (tr[b, j], 0, 0, 0))
        q_spec = pl.BlockSpec((1, nkv, g, hd), lambda b, j, tr, nr: (b, 0, 0, 0))
        sc_spec = pl.BlockSpec((1, block, nkv), lambda b, j, tr, nr: (tr[b, j], 0, 0))
        out_specs = [
            pl.BlockSpec((1, nkv, g, hd), lambda b, j, tr, nr: (b, 0, 0, 0)),
            pl.BlockSpec((1, nkv, g), lambda b, j, tr, nr: (b, 0, 0)),
            pl.BlockSpec((1, nkv, g), lambda b, j, tr, nr: (b, 0, 0)),
        ]
    in_specs = [q_spec, page_spec, page_spec]
    operands = [q, k_pool, v_pool]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        operands += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(bsz, max_pages),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nkv, g, hd), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nkv, g), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nkv, g), jnp.float32),
        ],
        interpret=_interpret(),
    )(*scalars, *operands)
    return o, m, l


def merge_current_token(q, k_cur, v_cur, o, m, l, *, scale: float | None = None):
    """One more online-softmax step folding the CURRENT token's (k, v) into the paged
    accumulator — the self-attention term for the token being decoded, whose KV has not
    been written to the pool yet.

    q, k_cur, v_cur: [B, nkv, g, hd] / [B, nkv, hd] / [B, nkv, hd].
    o, m, l: paged_attention outputs. Returns normalized attention [B, nkv, g, hd] f32.
    """
    hd = q.shape[-1]
    if scale is None:
        scale = hd ** -0.5
    s_c = jnp.einsum("bkgd,bkd->bkg", q.astype(jnp.float32),
                     k_cur.astype(jnp.float32)) * scale           # [B, nkv, g]
    m2 = jnp.maximum(m, s_c)
    alpha = jnp.exp(m - m2)
    w_c = jnp.exp(s_c - m2)
    l2 = l * alpha + w_c
    acc = o * alpha[..., None] + w_c[..., None] * v_cur[:, :, None, :].astype(jnp.float32)
    return acc / jnp.maximum(l2, 1e-30)[..., None]


def merge_block_tokens(q, k_blk, v_blk, o, m, l, *, scale: float | None = None):
    """Online-softmax merge of an S-token in-flight block (speculative verify).

    The S fresh queries all attend the same past pages — their paged accumulators
    come from ONE paged_attention call with the token axis folded into the GQA
    group axis — plus a causal triangle over the block itself (query i sees block
    keys 0..i), none of whose KV is in the pool yet. S == 1 reduces exactly to
    merge_current_token.

    q: [B, S, nkv, g, hd]; k_blk/v_blk: [B, S, nkv, hd];
    o/m/l: paged_attention outputs reshaped per query to [B, S, nkv, g(, hd)].
    Returns normalized attention [B, S, nkv, g, hd] f32.
    """
    hd = q.shape[-1]
    s = q.shape[1]
    if scale is None:
        scale = hd ** -0.5
    s_c = jnp.einsum("bikgd,bjkd->bikgj", q.astype(jnp.float32),
                     k_blk.astype(jnp.float32)) * scale        # [B, S, nkv, g, S]
    causal = jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]  # [S_q, S_k]
    s_c = jnp.where(causal[:, None, None, :], s_c, NEG_INF)
    m2 = jnp.maximum(m, jnp.max(s_c, axis=-1))
    alpha = jnp.exp(m - m2)
    w = jnp.exp(s_c - m2[..., None])
    l2 = l * alpha + jnp.sum(w, axis=-1)
    acc = o * alpha[..., None] + jnp.einsum("bikgj,bjkd->bikgd", w,
                                            v_blk.astype(jnp.float32))
    return acc / jnp.maximum(l2, 1e-30)[..., None]


def paged_attention_reference(q, k_pool, v_pool, block_tables, lengths,
                              layer_idx: jnp.ndarray | None = None, *,
                              k_scale: jnp.ndarray | None = None,
                              v_scale: jnp.ndarray | None = None,
                              scale: float | None = None):
    """XLA dense-gather reference (round-1 semantics) for kernel parity tests: gathers
    every mapped page and masks. int8 pools are dequantized up front. Returns the
    same (o, m, l) triple."""
    bsz, nkv, g, hd = q.shape
    if k_pool.ndim == 5:
        assert layer_idx is not None
        k_pool = k_pool[layer_idx]
        v_pool = v_pool[layer_idx]
        if k_scale is not None:
            k_scale = k_scale[layer_idx]
            v_scale = v_scale[layer_idx]
    if k_pool.dtype == jnp.int8:
        k_pool = k_pool.astype(jnp.float32) * k_scale[..., None]
        v_pool = v_pool.astype(jnp.float32) * v_scale[..., None]
    block = k_pool.shape[1]
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = hd ** -0.5
    kb = k_pool
    vb = v_pool
    idx = jnp.maximum(block_tables, 0)                            # [B, P]
    k_seq = kb[idx].reshape(bsz, max_pages * block, nkv, hd)      # [B, T, nkv, hd]
    v_seq = vb[idx].reshape(bsz, max_pages * block, nkv, hd)
    s = jnp.einsum("bkgd,btkd->bkgt", q.astype(jnp.float32),
                   k_seq.astype(jnp.float32)) * scale
    valid = jnp.arange(max_pages * block)[None] < lengths[:, None]
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bkgt,btkd->bkgd", p, v_seq.astype(jnp.float32))
    return o, m, l
