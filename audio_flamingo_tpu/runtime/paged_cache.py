"""Paged KV cache: fixed-size blocks + per-request block tables (BASELINE.json north-star
"paged KV cache for prefill/decode").

Motivation vs the slot cache (runtime/engine.py): slots reserve `capacity` for every
request; pages share one physical pool, so many short requests and one long request
coexist without reserving worst-case memory per slot. TPU-static design:

- physical pool: k/v blocks [L, num_blocks, block_size, nkv, hd] (+ optional int8);
- logical view: block_tables [B, max_blocks_per_seq] int32 (-1 = unmapped), lengths [B];
- reads gather a request's blocks with jnp.take (block tables are small int32 vectors;
  the gathered bytes equal a contiguous read);
- writes scatter this step's KV into (block, offset) computed from lengths;
- the allocator is host-side (free-list), like every serving stack's page allocator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import Qwen2Config
from audio_flamingo_tpu.ops import apply_rope, gqa_attention, rms_norm, rope_cos_sin
from audio_flamingo_tpu.models import qwen2


class PagedKV(NamedTuple):
    k: jnp.ndarray             # [L, NUM_BLOCKS, BLOCK, nkv, hd] (bf16 or int8)
    v: jnp.ndarray
    block_tables: jnp.ndarray  # [B, MAX_BLOCKS] int32, -1 = unmapped
    lengths: jnp.ndarray       # [B] int32 tokens filled per sequence
    k_scale: jnp.ndarray | None = None   # int8 pools: [L, NUM_BLOCKS, BLOCK, nkv] f32
    v_scale: jnp.ndarray | None = None

    @property
    def block_size(self) -> int:
        return self.k.shape[2]

    @property
    def max_blocks(self) -> int:
        return self.block_tables.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8


def init_paged(cfg: Qwen2Config, batch: int, num_blocks: int, block_size: int,
               max_blocks_per_seq: int, dtype=jnp.bfloat16) -> PagedKV:
    """dtype=jnp.int8 gives an int8 page pool (per-token dequant scales, the
    Q8KVCache quantization scheme) — half the page bytes, double the contexts."""
    hd = cfg.resolved_head_dim()
    shape = (cfg.num_layers, num_blocks, block_size, cfg.num_kv_heads, hd)
    scales = None
    if dtype == jnp.int8:
        scales = jnp.ones(shape[:-1], jnp.float32)
    return PagedKV(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.full((batch, max_blocks_per_seq), -1, jnp.int32),
                   jnp.zeros((batch,), jnp.int32),
                   scales, None if scales is None else scales.copy())


@dataclass
class BlockAllocator:
    """Host-side page allocator: free list over the physical block pool.

    reserve: number of leading blocks NEVER handed out. Engines reserve block 0 as the
    trash page: finished rows' tables reset to -1 (which maps to block 0), so their
    still-executing in-chunk writes can never corrupt re-allocated pages.
    """

    num_blocks: int
    reserve: int = 0
    free: list = field(default_factory=list)

    def __post_init__(self):
        self.free = list(range(self.num_blocks - 1, self.reserve - 1, -1))

    def alloc(self, n: int) -> list[int]:
        if len(self.free) < n:
            raise MemoryError(f"paged cache OOM: need {n} blocks, {len(self.free)} free")
        return [self.free.pop() for _ in range(n)]

    def release(self, blocks) -> None:
        for b in blocks:
            if b >= 0:
                self.free.append(int(b))


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "use_kernel"),
         donate_argnames=("cache",))
def paged_decode_step(params, cfg: Qwen2Config, cache: PagedKV, tokens: jnp.ndarray,
                      compute_dtype=jnp.bfloat16, use_kernel: bool = True):
    """One decode step for ALL rows: tokens [B] at positions cache.lengths.

    Returns (cache, logits [B, vocab] fp32). Attention reads K/V THROUGH the block
    table with the Pallas paged-attention kernel (ops/pallas/paged_attention.py): per
    row only ceil(len/block) pages of HBM traffic, no [B, max_blocks*block] dense
    gather (the round-1 approach — kept as use_kernel=False for comparison). The
    current token's KV is merged with one extra online-softmax step and written to its
    page after the layer scan.
    """
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        merge_current_token, paged_attention, paged_attention_reference)

    b = tokens.shape[0]
    hd = cfg.resolved_head_dim()
    nkv = cfg.num_kv_heads
    g = cfg.num_heads // nkv
    positions = cache.lengths
    cos, sin = rope_cos_sin(positions[:, None], hd, cfg.rope_theta)
    x = qwen2.embed(params, tokens[:, None], dtype=compute_dtype)

    # destination page of this step's KV (same for every layer)
    bs = cache.block_size
    block_ids = jnp.maximum(
        jnp.take_along_axis(cache.block_tables, (positions // bs)[:, None], axis=1)[:, 0], 0)
    offs = positions % bs
    attend = paged_attention if use_kernel else paged_attention_reference

    quantized = cache.quantized
    stacked, scan_layers = qwen2.split_stacked_w4(params["layers"])
    idxs = jnp.arange(cfg.num_layers)

    use_suffix = False
    if stacked is not None and b <= 8:
        from audio_flamingo_tpu.ops.pallas.quant4_block import suffix_supported

        use_suffix = suffix_supported(stacked, cfg)
    if use_suffix:
        ln1_full = params["layers"]["ln1_w"]
        qkv_bias = stacked["qkv"].get("b")
        y0 = qwen2.w4_suffix_seed(params, cfg, stacked, x)

        def body_sfx(carry, xs):
            h, y = carry
            lp, idx = xs

            def attend_paged(q, k, v):
                qg = q[:, 0].reshape(b, nkv, g, hd)
                # the WHOLE [L, ...] pool rides as a scan-invariant operand;
                # the kernel resolves (layer, page) inside its BlockSpec index
                # maps via scalar prefetch, so only this layer's mapped pages
                # are DMA'd. Scanning the pool sliced a full layer copy per
                # step (~0.65 GB/step at the 7B mixed shape) — the measured
                # paged-vs-slot bf16 gap (VERDICT r3 #6).
                o, m, l = attend(qg, cache.k, cache.v, cache.block_tables,
                                 cache.lengths, layer_idx=idx,
                                 k_scale=cache.k_scale, v_scale=cache.v_scale)
                if quantized:
                    kq, ksc = qwen2._quantize_kv(k)
                    vq, vsc = qwen2._quantize_kv(v)
                    k_cur = (kq.astype(jnp.float32) * ksc[..., None])[:, 0]
                    v_cur = (vq.astype(jnp.float32) * vsc[..., None])[:, 0]
                    new_kv = (kq[:, 0], vq[:, 0], ksc[:, 0], vsc[:, 0])
                else:
                    k_cur, v_cur = k[:, 0], v[:, 0]
                    new_kv = (k[:, 0].astype(cache.k.dtype),
                              v[:, 0].astype(cache.v.dtype))
                attn = merge_current_token(qg, k_cur, v_cur, o, m, l)
                return attn.reshape(b, 1, cfg.num_heads, hd), new_kv

            return qwen2.w4_suffix_layer_step(
                h, y, lp, idx, cfg=cfg, stacked=stacked, ln1_full=ln1_full,
                qkv_bias=qkv_bias, cos=cos, sin=sin, attend=attend_paged)

        if quantized:
            (x, _), (ks, vs, kscs, vscs) = jax.lax.scan(body_sfx, (x, y0),
                                                        (scan_layers, idxs))
        else:
            (x, _), (ks, vs) = jax.lax.scan(body_sfx, (x, y0),
                                            (scan_layers, idxs))
        l_idx = jnp.repeat(jnp.arange(cfg.num_layers), b)
        b_flat = jnp.tile(block_ids, cfg.num_layers)
        o_flat = jnp.tile(offs, cfg.num_layers)
        k_new = cache.k.at[l_idx, b_flat, o_flat].set(ks.reshape(-1, nkv, hd))
        v_new = cache.v.at[l_idx, b_flat, o_flat].set(vs.reshape(-1, nkv, hd))
        ksc_new, vsc_new = cache.k_scale, cache.v_scale
        if quantized:
            ksc_new = cache.k_scale.at[l_idx, b_flat, o_flat].set(
                kscs.reshape(-1, nkv))
            vsc_new = cache.v_scale.at[l_idx, b_flat, o_flat].set(
                vscs.reshape(-1, nkv))
        x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
        logits = qwen2.unembed(params, cfg, x[:, 0])
        return PagedKV(k_new, v_new, cache.block_tables, cache.lengths + 1,
                       ksc_new, vsc_new), logits

    def body(carry, xs):
        h = carry
        # the [L, ...] pool is a scan-INVARIANT operand; the paged kernel
        # resolves (layer, page) inside its BlockSpec index maps via scalar
        # prefetch (ops/pallas/paged_attention.py stacked path), so only this
        # layer's mapped pages are DMA'd. Earlier designs that sliced the
        # layer outside the kernel — whether scan xs or dynamic_index_in_dim —
        # materialized a full layer-pool copy per layer per step
        # (~0.65 GB/step at the 7B mixed-workload shape; VERDICT r3 #6).
        lp, idx = xs
        hn = rms_norm(h, lp["ln1_w"], cfg.rms_norm_eps)
        q, k, v = qwen2.qkv_proj(hn, lp, cfg, stacked, idx)
        q, k = apply_rope(q, k, cos, sin)
        qg = q[:, 0].reshape(b, nkv, g, hd)
        o, m, l = attend(qg, cache.k, cache.v, cache.block_tables, cache.lengths,
                         layer_idx=idx, k_scale=cache.k_scale,
                         v_scale=cache.v_scale)
        if quantized:
            # merge with the DEQUANTIZED current kv so paged-q8 decode matches the
            # dense Q8KVCache path bit-for-bit in what each position contributes
            kq, ksc = qwen2._quantize_kv(k)
            vq, vsc = qwen2._quantize_kv(v)
            k_cur = (kq.astype(jnp.float32) * ksc[..., None])[:, 0]
            v_cur = (vq.astype(jnp.float32) * vsc[..., None])[:, 0]
            new_kv = (kq[:, 0], vq[:, 0], ksc[:, 0], vsc[:, 0])
        else:
            k_cur, v_cur = k[:, 0], v[:, 0]
            new_kv = (k[:, 0].astype(cache.k.dtype), v[:, 0].astype(cache.v.dtype))
        attn = merge_current_token(qg, k_cur, v_cur, o, m, l)   # [b, nkv, g, hd]
        attn = attn.reshape(b, 1, cfg.num_heads * hd).astype(h.dtype)
        h = h + qwen2.o_proj(attn, lp, stacked, idx)
        hn = rms_norm(h, lp["ln2_w"], cfg.rms_norm_eps)
        h = h + qwen2.mlp_forward(hn, lp, cfg, stacked, idx)
        return h, new_kv

    if quantized:
        x, (ks, vs, kscs, vscs) = jax.lax.scan(body, x, (scan_layers, idxs))
    else:
        x, (ks, vs) = jax.lax.scan(body, x, (scan_layers, idxs))
    # physical writes: ks [L, B, nkv, hd] at (layer, block_ids[B], offs[B])
    l_idx = jnp.repeat(jnp.arange(cfg.num_layers), b)
    b_flat = jnp.tile(block_ids, cfg.num_layers)
    o_flat = jnp.tile(offs, cfg.num_layers)
    k_new = cache.k.at[l_idx, b_flat, o_flat].set(ks.reshape(-1, nkv, hd))
    v_new = cache.v.at[l_idx, b_flat, o_flat].set(vs.reshape(-1, nkv, hd))
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if quantized:
        ksc_new = cache.k_scale.at[l_idx, b_flat, o_flat].set(kscs.reshape(-1, nkv))
        vsc_new = cache.v_scale.at[l_idx, b_flat, o_flat].set(vscs.reshape(-1, nkv))

    x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
    logits = qwen2.unembed(params, cfg, x[:, 0])
    return PagedKV(k_new, v_new, cache.block_tables, cache.lengths + 1,
                   ksc_new, vsc_new), logits


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "use_kernel"),
         donate_argnames=("cache",))
def paged_verify_step(params, cfg: Qwen2Config, cache: PagedKV, tokens: jnp.ndarray,
                      compute_dtype=jnp.bfloat16, use_kernel: bool = True):
    """Multi-token forward through pages (speculative VERIFY): tokens [B, S]
    occupy positions lengths..lengths+S-1 per row.

    Attention per layer = past pages via ONE paged_attention call with the S
    fresh queries folded into the GQA group axis (every query attends the same
    per-row past), plus the in-block causal triangle merged in XLA
    (ops/pallas/paged_attention.merge_block_tokens). All S tokens' KV is written
    to their pages; `lengths` is returned UNCHANGED — the caller advances it by
    its per-row accepted count, and rejected positions are overwritten before
    they are ever attended (mask is length-based, same rollback argument as the
    slot engine's decode_spec_chunk).

    The engine must have pages mapped covering lengths+S-1 (its page growth uses
    the spec step budget). Returns (cache, logits [B, S, vocab] fp32).
    """
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        merge_block_tokens, paged_attention, paged_attention_reference)

    b, s = tokens.shape
    hd = cfg.resolved_head_dim()
    nkv = cfg.num_kv_heads
    g = cfg.num_heads // nkv
    pos_grid = cache.lengths[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin(pos_grid, hd, cfg.rope_theta)
    x = qwen2.embed(params, tokens, dtype=compute_dtype)

    bs_ = cache.block_size
    page_pos = jnp.minimum(pos_grid // bs_, cache.block_tables.shape[1] - 1)
    block_ids = jnp.maximum(
        jnp.take_along_axis(cache.block_tables, page_pos, axis=1), 0)   # [B, S]
    offs = pos_grid % bs_
    attend = paged_attention if use_kernel else paged_attention_reference

    quantized = cache.quantized
    stacked, scan_layers = qwen2.split_stacked_w4(params["layers"])
    idxs = jnp.arange(cfg.num_layers)

    def body(carry, xs):
        h = carry
        lp, idx = xs
        hn = rms_norm(h, lp["ln1_w"], cfg.rms_norm_eps)
        q, k, v = qwen2.qkv_proj(hn, lp, cfg, stacked, idx)
        q, k = apply_rope(q, k, cos, sin)
        # fold S queries into the group axis: kernel slot (kv, i*g + gg) holds
        # query token i, group head gg
        qf = q.reshape(b, s, nkv, g, hd).transpose(0, 2, 1, 3, 4) \
              .reshape(b, nkv, s * g, hd)
        # scan-invariant [L, ...] pool + in-kernel layer prefetch (see
        # paged_decode_step.body)
        o, m_, l_ = attend(qf, cache.k, cache.v, cache.block_tables,
                           cache.lengths, layer_idx=idx,
                           k_scale=cache.k_scale, v_scale=cache.v_scale)
        o = o.reshape(b, nkv, s, g, hd).transpose(0, 2, 1, 3, 4)
        m_ = m_.reshape(b, nkv, s, g).transpose(0, 2, 1, 3)
        l_ = l_.reshape(b, nkv, s, g).transpose(0, 2, 1, 3)
        qg = q.reshape(b, s, nkv, g, hd)
        if quantized:
            # merge with the DEQUANTIZED block so paged-q8 matches the dense
            # Q8KVCache path in what each position contributes
            kq, ksc = qwen2._quantize_kv(k)
            vq, vsc = qwen2._quantize_kv(v)
            k_cur = kq.astype(jnp.float32) * ksc[..., None]
            v_cur = vq.astype(jnp.float32) * vsc[..., None]
            new_kv = (kq, vq, ksc, vsc)
        else:
            k_cur, v_cur = k, v
            new_kv = (k.astype(cache.k.dtype), v.astype(cache.v.dtype))
        attn = merge_block_tokens(qg, k_cur, v_cur, o, m_, l_)  # [b,s,nkv,g,hd]
        attn = attn.reshape(b, s, cfg.num_heads * hd).astype(h.dtype)
        h = h + qwen2.o_proj(attn, lp, stacked, idx)
        hn = rms_norm(h, lp["ln2_w"], cfg.rms_norm_eps)
        h = h + qwen2.mlp_forward(hn, lp, cfg, stacked, idx)
        return h, new_kv

    if quantized:
        x, (ks, vs, kscs, vscs) = jax.lax.scan(body, x, (scan_layers, idxs))
    else:
        x, (ks, vs) = jax.lax.scan(body, x, (scan_layers, idxs))
    # physical writes: [L, B, S, nkv, hd] at (layer, block_ids[B,S], offs[B,S])
    l_idx = jnp.repeat(jnp.arange(cfg.num_layers), b * s)
    b_flat = jnp.tile(block_ids.reshape(-1), cfg.num_layers)
    o_flat = jnp.tile(offs.reshape(-1), cfg.num_layers)
    k_new = cache.k.at[l_idx, b_flat, o_flat].set(ks.reshape(-1, nkv, hd))
    v_new = cache.v.at[l_idx, b_flat, o_flat].set(vs.reshape(-1, nkv, hd))
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if quantized:
        ksc_new = cache.k_scale.at[l_idx, b_flat, o_flat].set(kscs.reshape(-1, nkv))
        vsc_new = cache.v_scale.at[l_idx, b_flat, o_flat].set(vscs.reshape(-1, nkv))

    x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
    logits = qwen2.unembed(params, cfg, x)                       # [B, S, vocab]
    return PagedKV(k_new, v_new, cache.block_tables, cache.lengths,
                   ksc_new, vsc_new), logits


@partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k", "rounds",
                                   "eos_token_id", "compute_dtype", "accept_sim"),
         donate_argnames=("cache", "d_k", "d_v"))
def paged_decode_spec_chunk(params, draft_params, cfg: Qwen2Config, draft_cfg,
                            cache: PagedKV, d_k, d_v, tokens, done, rng=None, *,
                            k: int, rounds: int, eos_token_id: int,
                            compute_dtype=jnp.bfloat16,
                            accept_sim: float | None = None):
    """Batched GREEDY speculative decoding over the PAGED pool: the shared
    spec round (engine.spec_chunk_rounds) with paged_verify_step as the target
    forward — speculation composes with the int8 page pool's halved KV
    traffic. Emitted tokens == target-only greedy exactly; rollback = advance
    `lengths` by the accepted count (rejected page slots are overwritten
    before attended). The DRAFT runs on a dense per-row SlotCache (d_k, d_v):
    draft models are small, so worst-case reservation is cheap there."""
    from audio_flamingo_tpu.runtime.engine import spec_chunk_rounds

    cache, d_k, d_v, tokens, done, _rng, out, valid = spec_chunk_rounds(
        draft_params, draft_cfg, cache, d_k, d_v, tokens, done, rng,
        k=k, rounds=rounds, eos_token_id=eos_token_id,
        compute_dtype=compute_dtype, nv=cfg.vocab_size,
        verify=lambda c, seq: paged_verify_step(params, cfg, c, seq,
                                                compute_dtype),
        set_lengths=lambda c, nl: c._replace(lengths=nl),
        accept_sim=accept_sim)
    return cache, d_k, d_v, tokens, done, out, valid


@partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k", "rounds",
                                   "eos_token_id", "sampling", "compute_dtype"),
         donate_argnames=("cache", "d_k", "d_v"))
def paged_decode_spec_chunk_sampled(params, draft_params, cfg: Qwen2Config,
                                    draft_cfg, cache: PagedKV, d_k, d_v, tokens,
                                    done, rng, *, k: int, rounds: int,
                                    eos_token_id: int, sampling,
                                    compute_dtype=jnp.bfloat16):
    """SAMPLED (Leviathan) speculative decoding over the paged pool — the
    shared spec round with paged_verify_step as the target forward; emitted
    marginal law == warped-target ancestral sampling (one warp for every row,
    engine.decode_spec_chunk_sampled docstring)."""
    from audio_flamingo_tpu.runtime.engine import spec_chunk_rounds

    return spec_chunk_rounds(
        draft_params, draft_cfg, cache, d_k, d_v, tokens, done, rng,
        k=k, rounds=rounds, eos_token_id=eos_token_id,
        compute_dtype=compute_dtype, nv=cfg.vocab_size,
        verify=lambda c, seq: paged_verify_step(params, cfg, c, seq,
                                                compute_dtype),
        set_lengths=lambda c, nl: c._replace(lengths=nl),
        sampling=sampling)


@partial(jax.jit, static_argnames=("cfg", "chunk", "eos_token_id",
                                   "compute_dtype", "mixed_sampling",
                                   "want_logprobs", "use_min_new",
                                   "use_penalty", "ngram_ns"),
         donate_argnames=("cache", "hist"))
def paged_decode_chunk(params, cfg: Qwen2Config, cache: PagedKV, tokens, done, rng,
                       rows, min_left, hist=None, *, chunk: int, eos_token_id: int,
                       compute_dtype=jnp.bfloat16, mixed_sampling: bool = False,
                       want_logprobs: bool = False, use_min_new: bool = False,
                       use_penalty: bool = False, ngram_ns: tuple = ()):
    """Advance all rows `chunk` steps through their pages (one host sync per chunk).

    rows: ops.sampling.RowSampling — PER-ROW sampling parameters as traced arrays
    (per-request sampling with a single compiled program). min_left: [B] int32
    remaining min-new-tokens per row (EOS masked while positive). Also returns
    lp [B, chunk] fp32 sampled-token logprobs ([hf] output_scores role).
    hist [B, H]: device-resident prompt+generated history for the repetition-
    penalty / n-gram processors (same contract as engine.decode_chunk: row b holds
    lengths[b]+1 valid tokens, -1 elsewhere); returned updated."""
    from audio_flamingo_tpu.ops.sampling import engine_row_step

    b = tokens.shape[0]
    out0 = jnp.full((b, chunk), eos_token_id, jnp.int32)
    lp0 = jnp.zeros((b, chunk), jnp.float32)
    if hist is None:
        hist = jnp.full((b, 8), -1, jnp.int32)   # unused placeholder (processors off)

    def body(i, carry):
        cache, tok, done, rng, out, lp, hist = carry
        cache2, logits = paged_decode_step(params, cfg, cache, tok, compute_dtype)
        rng, kk = jax.random.split(rng)
        nxt, lp_val, hist = engine_row_step(
            kk, logits, hist, cache.lengths + 1, rows, done, min_left, i,
            eos_token_id=eos_token_id, mixed_sampling=mixed_sampling,
            want_logprobs=want_logprobs, use_min_new=use_min_new,
            use_penalty=use_penalty, ngram_ns=ngram_ns)
        if want_logprobs:
            lp = lp.at[:, i].set(lp_val)
        # rows that are done must not advance their length (paged_decode_step adds 1)
        lengths = jnp.where(done, cache.lengths, cache2.lengths)
        cache2 = cache2._replace(lengths=lengths)
        out = out.at[:, i].set(nxt)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return cache2, nxt, done, rng, out, lp, hist

    cache, tokens, done, rng, out, lp, hist = jax.lax.fori_loop(
        0, chunk, body, (cache, tokens, done, rng, out0, lp0, hist))
    return cache, tokens, done, rng, out, lp, hist


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"), donate_argnames=("cache",))
def paged_install_prefill(cache: PagedKV, row: jnp.ndarray, sub_k: jnp.ndarray,
                          sub_v: jnp.ndarray, table_row: jnp.ndarray,
                          length: jnp.ndarray, cfg: Qwen2Config,
                          compute_dtype=jnp.bfloat16):
    """Install a contiguous prefill cache ([L, 1, C, nkv, hd]) into mapped pages.

    C may be ANY multiple of block_size up to max_blocks*block_size (the prefill shape
    bucket is decoupled from the worst case — round-1 required equality): only the
    C/block_size leading entries of table_row are written; table_row entries beyond
    them stay -1 until decode grows into fresh pages.
    """
    l, _, c, nkv, hd = sub_k.shape
    bs = cache.block_size
    assert c % bs == 0, (c, bs)
    n_pages = c // bs
    assert n_pages <= cache.max_blocks, (n_pages, cache.max_blocks)
    idx = jnp.maximum(table_row[:n_pages], 0)
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if cache.quantized:   # int8 pools: per-token Q8KVCache quantization + scales
        kq, ksc = qwen2._quantize_kv(sub_k[:, 0])
        vq, vsc = qwen2._quantize_kv(sub_v[:, 0])
        k_pages = kq.reshape(l, n_pages, bs, nkv, hd)
        v_pages = vq.reshape(l, n_pages, bs, nkv, hd)
        ksc_new = cache.k_scale.at[:, idx].set(ksc.reshape(l, n_pages, bs, nkv))
        vsc_new = cache.v_scale.at[:, idx].set(vsc.reshape(l, n_pages, bs, nkv))
    else:
        k_pages = sub_k[:, 0].reshape(l, n_pages, bs, nkv, hd).astype(cache.k.dtype)
        v_pages = sub_v[:, 0].reshape(l, n_pages, bs, nkv, hd).astype(cache.v.dtype)
    k_new = cache.k.at[:, idx].set(k_pages)
    v_new = cache.v.at[:, idx].set(v_pages)
    tables = cache.block_tables.at[row].set(table_row)
    lengths = cache.lengths.at[row].set(length)
    return PagedKV(k_new, v_new, tables, lengths, ksc_new, vsc_new)


@partial(jax.jit, donate_argnames=("cache",))
def paged_restore_pages(cache: PagedKV, k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                        ks_pages: jnp.ndarray | None, vs_pages: jnp.ndarray | None,
                        page_ids: jnp.ndarray) -> PagedKV:
    """Write host-swapped pages back into the pool (preemption resume).

    page_ids may be padded with 0 (the trash page) to bound the compile universe —
    duplicate scatter indices all land on the trash block, which is never read."""
    k_new = cache.k.at[:, page_ids].set(k_pages.astype(cache.k.dtype))
    v_new = cache.v.at[:, page_ids].set(v_pages.astype(cache.v.dtype))
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if cache.quantized:
        ksc_new = cache.k_scale.at[:, page_ids].set(ks_pages)
        vsc_new = cache.v_scale.at[:, page_ids].set(vs_pages)
    return PagedKV(k_new, v_new, cache.block_tables, cache.lengths,
                   ksc_new, vsc_new)


@partial(jax.jit, static_argnames=("cfg", "n_prefix_pages", "suffix_len",
                                   "compute_dtype"))
def paged_prefill_suffix(params, cfg: Qwen2Config, cache: PagedKV,
                         prefix_page_ids: jnp.ndarray, suffix_embeds: jnp.ndarray,
                         prompt_len: jnp.ndarray, *, n_prefix_pages: int,
                         suffix_len: int, compute_dtype=jnp.bfloat16):
    """Prefill only a prompt's SUFFIX against prefix KV already resident in pages
    (automatic prefix caching, vLLM-style — the paged-pool payoff for chat serving:
    recurring system/audio prefixes are computed once and shared read-only).

    prefix_page_ids: [n_prefix_pages] physical pages holding tokens
    [0, n_prefix_pages*block). suffix_embeds: [1, suffix_len, d] embeddings for
    tokens from that boundary on (right-padded to the shape bucket). prompt_len:
    [] the TRUE total prompt length (logits come from position prompt_len-1).

    Returns (suffix_k, suffix_v [L, 1, suffix_len, nkv, hd] compute-dtype KV for
    the suffix — feed to paged_install_pages — and last-token logits fp32).
    """
    prefix_len = n_prefix_pages * cache.block_size
    nkv, hd = cache.k.shape[-2], cache.k.shape[-1]
    num_layers = cache.k.shape[0]

    k_pref = jnp.take(cache.k, prefix_page_ids, axis=1)   # [L, P, bs, nkv, hd]
    v_pref = jnp.take(cache.v, prefix_page_ids, axis=1)
    if cache.quantized:
        ks = jnp.take(cache.k_scale, prefix_page_ids, axis=1)
        vs = jnp.take(cache.v_scale, prefix_page_ids, axis=1)
        k_pref = k_pref.astype(jnp.float32) * ks[..., None]
        v_pref = v_pref.astype(jnp.float32) * vs[..., None]
    capacity = prefix_len + suffix_len
    k0 = jnp.zeros((num_layers, 1, capacity, nkv, hd), compute_dtype)
    k0 = k0.at[:, 0, :prefix_len].set(
        k_pref.reshape(num_layers, prefix_len, nkv, hd).astype(compute_dtype))
    v0 = jnp.zeros((num_layers, 1, capacity, nkv, hd), compute_dtype)
    v0 = v0.at[:, 0, :prefix_len].set(
        v_pref.reshape(num_layers, prefix_len, nkv, hd).astype(compute_dtype))
    lm_cache = qwen2.KVCache(k=k0, v=v0, index=jnp.asarray(prefix_len, jnp.int32))
    pos = (prefix_len + jnp.arange(suffix_len))[None]
    # an empty prefix IS a fresh prefill (cache.index == 0) -> flash fast path ok
    h, new_cache = qwen2.forward(params, cfg, suffix_embeds.astype(compute_dtype),
                                 pos, cache=lm_cache,
                                 is_prefill=(n_prefix_pages == 0))
    last = jnp.take_along_axis(
        h, jnp.full((1, 1, 1), prompt_len - 1 - prefix_len, jnp.int32)
        .repeat(h.shape[-1], -1), axis=1)
    logits = qwen2.unembed(params, cfg, last[:, 0])
    return new_cache.k[:, :, prefix_len:], new_cache.v[:, :, prefix_len:], logits


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"), donate_argnames=("cache",))
def paged_install_pages(cache: PagedKV, sub_k: jnp.ndarray, sub_v: jnp.ndarray,
                        page_ids: jnp.ndarray, cfg: Qwen2Config,
                        compute_dtype=jnp.bfloat16):
    """Write a prefill's KV into physical pages ONLY (tables/lengths live on the
    HOST in PagedEngine — device-side table updates compiled a fresh scatter per
    page-count and cost a dispatch+sync every scheduling round). int8 pools
    quantize the prefill pages with the Q8KVCache per-token scheme."""
    l, _, c, nkv, hd = sub_k.shape
    bs = cache.block_size
    n_pages = c // bs
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if cache.quantized:
        kq, ksc = qwen2._quantize_kv(sub_k[:, 0])     # [L, C, nkv, hd]/[L, C, nkv]
        vq, vsc = qwen2._quantize_kv(sub_v[:, 0])
        k_pages = kq.reshape(l, n_pages, bs, nkv, hd)
        v_pages = vq.reshape(l, n_pages, bs, nkv, hd)
        ksc_new = cache.k_scale.at[:, page_ids].set(ksc.reshape(l, n_pages, bs, nkv))
        vsc_new = cache.v_scale.at[:, page_ids].set(vsc.reshape(l, n_pages, bs, nkv))
    else:
        k_pages = sub_k[:, 0].reshape(l, n_pages, bs, nkv, hd).astype(cache.k.dtype)
        v_pages = sub_v[:, 0].reshape(l, n_pages, bs, nkv, hd).astype(cache.v.dtype)
    k_new = cache.k.at[:, page_ids].set(k_pages)
    v_new = cache.v.at[:, page_ids].set(v_pages)
    return PagedKV(k_new, v_new, cache.block_tables, cache.lengths,
                   ksc_new, vsc_new)
