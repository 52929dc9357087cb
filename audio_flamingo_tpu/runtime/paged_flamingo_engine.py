"""Paged continuous-batching engine for the AF1/AF2 (gated-xattn) families.

VERDICT round-2 Next #5: the slot-based FlamingoEngine reserved `capacity` KV per slot;
5-minute AF2 audio (long prompts, README.md:172) makes worst-case reservation expensive.
This engine brings the xattn family onto the paged stack (runtime/paged_cache.py): rows
map to pages from a shared pool via block tables, grow lazily per chunk, and preempt to
host memory under pool pressure — the same scheduler semantics as the AF3 PagedEngine,
with a per-row MEDIA buffer (CLAP window features, fixed during generation) and the
gated-xattn decode step reading self-attention KV THROUGH the Pallas paged-attention
kernel (ops/pallas/paged_attention.py).

The xattn cadence (a gated block before every Nth LM layer, [hf]
idefics/modeling_idefics.py lineage) cannot ride one scan, so the per-step stack is a
Python loop over layer groups like models/flamingo.py::_lm_forward_with_xattn; page
writes are batched after the loop. Supports the bf16 AND int8 page pools.
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF2Config
from audio_flamingo_tpu.models import flamingo
from audio_flamingo_tpu.models import opt as opt_mod
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops import apply_rope, layer_norm, rms_norm, rope_cos_sin
from audio_flamingo_tpu.ops import xattn as xattn_op
from audio_flamingo_tpu.ops.sampling import (SamplingParams, engine_row_step,
                                             processor_flags, row_sampling)
from audio_flamingo_tpu.runtime.engine import (_emit_first_token,
                                               _finish_request_metrics,
                                               _postprocess_chunk_row,
                                               _start_request_metrics)
from audio_flamingo_tpu.runtime.flamingo_engine import FlamingoRequest
from audio_flamingo_tpu.runtime.paged_cache import (BlockAllocator, PagedKV,
                                                    init_paged,
                                                    paged_install_pages,
                                                    paged_restore_pages)
from audio_flamingo_tpu.runtime.paged_engine import PrefixStore, _block_keys


def _paged_attn_fn(cache: PagedKV, attn_impl: str = "auto"):
    """Pick the paged-attention implementation for this pool geometry.

    A pallas_call costs ~27 us FIXED on this backend (CLAUDE.md perf facts):
    a 36-layer 3B decode step pays ~1 ms of pure kernel dispatch — MORE than
    the dense-gather traffic the kernel saves when the pool is small (a
    56-block x 128 bf16 layer slice is ~3.7 MB; measured xattn_paged_vs_slot
    0.958 with the kernel everywhere). Small non-quantized pools therefore run
    the XLA dense-gather path (`paged_attention_reference` — the kernel's own
    equality-test oracle, so the two are interchangeable by construction);
    large or int8 pools keep the Pallas kernel, whose per-page DMA is the
    whole point at 16k-token 7B pools. "kernel" / "dense" pin either path
    (tests cover both)."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        paged_attention, paged_attention_reference)

    if attn_impl == "kernel":
        return paged_attention
    if attn_impl == "dense":
        return paged_attention_reference
    if cache.quantized:
        return paged_attention
    nb, blk, nkv, hd = cache.k.shape[1:]
    layer_bytes = nb * blk * nkv * hd * cache.k.dtype.itemsize
    return paged_attention_reference if layer_bytes <= (8 << 20) \
        else paged_attention


def _xattn_paged_step(params, cfg: AF2Config, cache: PagedKV, media, tokens,
                      compute_dtype, attn_impl: str = "auto"):
    """One decode step for ALL rows through their pages + gated xattn.

    tokens [B] at positions cache.lengths; media [B, S, d_audio] per-row features.
    Returns (cache-with-writes, logits [B, vocab] fp32)."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import merge_current_token

    attn_fn = _paged_attn_fn(cache, attn_impl)
    lm = params["lm"]
    lcfg = cfg.lm
    b = tokens.shape[0]
    is_opt = flamingo._is_opt(cfg)
    positions = cache.lengths
    x = flamingo._embed(params, cfg, tokens[:, None], dtype=compute_dtype)
    if is_opt:
        hd = lcfg.hidden_size // lcfg.num_heads
        nkv, g, scale = lcfg.num_heads, 1, 1.0
        x = x + lm["pos_embed"].astype(x.dtype)[
            (positions + lcfg.position_offset)[:, None]]
        cos = sin = None
    else:
        hd = lcfg.resolved_head_dim()
        nkv = lcfg.num_kv_heads
        g = lcfg.num_heads // nkv
        scale = None
        cos, sin = rope_cos_sin(positions[:, None], hd, lcfg.rope_theta)

    every = cfg.xattn.cross_every_n_layers
    nh = lcfg.num_heads
    quantized = cache.quantized
    stacked, scan_layers = (None, lm["layers"]) if is_opt \
        else qwen2.split_stacked_w4(lm["layers"])
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for i in range(lcfg.num_layers):
        if i % every == 0:
            xp = jax.tree.map(lambda a: a[i // every], params["xattn"])
            x = xattn_op.apply(xp, x, media, cfg.xattn.num_heads)
        lp = jax.tree.map(lambda a: a[i], scan_layers)
        idx = jnp.int32(i)
        if is_opt:
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"]) if lcfg.do_layer_norm_before else x
            q = (opt_mod._linear(h, lp["q"]) * (hd ** -0.5)).reshape(b, 1, nh, hd)
            k = opt_mod._linear(h, lp["k"]).reshape(b, 1, nkv, hd)
            v = opt_mod._linear(h, lp["v"]).reshape(b, 1, nkv, hd)
        else:
            h = rms_norm(x, lp["ln1_w"], lcfg.rms_norm_eps)
            q, k, v = qwen2.qkv_proj(h, lp, lcfg, stacked, idx)
            q, k = apply_rope(q, k, cos, sin)
        qg = q[:, 0].reshape(b, nkv, g, hd)
        # stacked pool + in-kernel layer resolution: slicing cache.k[i] here
        # (the unrolled-loop analogue of scan xs) materialized a copy of the
        # layer's whole pool per layer per step — the measured 0.905
        # xattn_paged_vs_slot gap (VERDICT r4 #4; paged_cache.py decode body
        # is the reference pattern). attn resolves kernel-vs-dense per pool
        # geometry (_paged_attn_fn).
        o, m, l = attn_fn(qg, cache.k, cache.v, cache.block_tables,
                          cache.lengths, layer_idx=idx,
                          k_scale=cache.k_scale, v_scale=cache.v_scale,
                          scale=scale)
        if quantized:
            kq, ksc = qwen2._quantize_kv(k)
            vq, vsc = qwen2._quantize_kv(v)
            k_cur = (kq.astype(jnp.float32) * ksc[..., None])[:, 0]
            v_cur = (vq.astype(jnp.float32) * vsc[..., None])[:, 0]
            new_k.append(kq[:, 0]); new_v.append(vq[:, 0])
            new_ks.append(ksc[:, 0]); new_vs.append(vsc[:, 0])
        else:
            k_cur, v_cur = k[:, 0], v[:, 0]
            new_k.append(k[:, 0].astype(cache.k.dtype))
            new_v.append(v[:, 0].astype(cache.v.dtype))
        attn = merge_current_token(qg, k_cur, v_cur, o, m, l, scale=scale)
        attn = attn.reshape(b, 1, nh * hd).astype(x.dtype)
        if is_opt:
            x = x + opt_mod._linear(attn, lp["o"])
            if not lcfg.do_layer_norm_before:
                x = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
            res = x
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"]) if lcfg.do_layer_norm_before else x
            x = res + opt_mod._linear(jax.nn.relu(opt_mod._linear(h, lp["fc1"])),
                                      lp["fc2"])
            if not lcfg.do_layer_norm_before:
                x = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        else:
            x = x + qwen2.o_proj(attn, lp, stacked, idx)
            h = rms_norm(x, lp["ln2_w"], lcfg.rms_norm_eps)
            x = x + qwen2.mlp_forward(h, lp, lcfg, stacked, idx)

    # batched physical writes: [L, B, nkv, hd] at (layer, block_ids[B], offs[B])
    bs = cache.block_size
    block_ids = jnp.maximum(
        jnp.take_along_axis(cache.block_tables, (positions // bs)[:, None],
                            axis=1)[:, 0], 0)
    offs = positions % bs
    L = lcfg.num_layers
    l_idx = jnp.repeat(jnp.arange(L), b)
    b_flat = jnp.tile(block_ids, L)
    o_flat = jnp.tile(offs, L)
    ks = jnp.stack(new_k).reshape(-1, nkv, hd)
    vs = jnp.stack(new_v).reshape(-1, nkv, hd)
    k_new = cache.k.at[l_idx, b_flat, o_flat].set(ks)
    v_new = cache.v.at[l_idx, b_flat, o_flat].set(vs)
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if quantized:
        ksc_new = cache.k_scale.at[l_idx, b_flat, o_flat].set(
            jnp.stack(new_ks).reshape(-1, nkv))
        vsc_new = cache.v_scale.at[l_idx, b_flat, o_flat].set(
            jnp.stack(new_vs).reshape(-1, nkv))

    if is_opt:
        if "ln_f_w" in lm:
            x = layer_norm(x, lm["ln_f_w"], lm["ln_f_b"])
    else:
        x = rms_norm(x, lm["ln_f_w"], lcfg.rms_norm_eps)
    logits = flamingo._unembed(params, cfg, x[:, 0])
    return PagedKV(k_new, v_new, cache.block_tables, cache.lengths + 1,
                   ksc_new, vsc_new), logits


def _xattn_paged_verify(params, cfg: AF2Config, cache: PagedKV, media, tokens,
                        compute_dtype, attn_impl: str = "auto"):
    """S-token speculative VERIFY through pages + gated xattn.

    tokens [B, S] occupy positions lengths..lengths+S-1 per row. Per layer the
    S fresh queries fold into the paged kernel's GQA group axis (one kernel
    call over the past pages) and the in-block causal triangle merges in XLA
    (merge_block_tokens) — the xattn analogue of paged_cache.paged_verify_step.
    All S KV entries are written to their pages; `lengths` returns UNCHANGED
    (the caller advances by the accepted count; rejected slots are overwritten
    before attended). Returns (cache, logits [B, S, vocab])."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import merge_block_tokens

    attn_fn = _paged_attn_fn(cache, attn_impl)
    lm = params["lm"]
    lcfg = cfg.lm
    b, s = tokens.shape
    is_opt = flamingo._is_opt(cfg)
    positions = cache.lengths
    pos_grid = positions[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    x = flamingo._embed(params, cfg, tokens, dtype=compute_dtype)
    if is_opt:
        hd = lcfg.hidden_size // lcfg.num_heads
        nkv, g, scale = lcfg.num_heads, 1, 1.0
        x = x + lm["pos_embed"].astype(x.dtype)[pos_grid + lcfg.position_offset]
        cos = sin = None
    else:
        hd = lcfg.resolved_head_dim()
        nkv = lcfg.num_kv_heads
        g = lcfg.num_heads // nkv
        scale = None
        cos, sin = rope_cos_sin(pos_grid, hd, lcfg.rope_theta)

    every = cfg.xattn.cross_every_n_layers
    nh = lcfg.num_heads
    quantized = cache.quantized
    stacked, scan_layers = (None, lm["layers"]) if is_opt \
        else qwen2.split_stacked_w4(lm["layers"])
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for i in range(lcfg.num_layers):
        if i % every == 0:
            xp = jax.tree.map(lambda a: a[i // every], params["xattn"])
            x = xattn_op.apply(xp, x, media, cfg.xattn.num_heads)
        lp = jax.tree.map(lambda a: a[i], scan_layers)
        idx = jnp.int32(i)
        if is_opt:
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"]) if lcfg.do_layer_norm_before else x
            q = (opt_mod._linear(h, lp["q"]) * (hd ** -0.5)).reshape(b, s, nh, hd)
            k = opt_mod._linear(h, lp["k"]).reshape(b, s, nkv, hd)
            v = opt_mod._linear(h, lp["v"]).reshape(b, s, nkv, hd)
        else:
            h = rms_norm(x, lp["ln1_w"], lcfg.rms_norm_eps)
            q, k, v = qwen2.qkv_proj(h, lp, lcfg, stacked, idx)
            q, k = apply_rope(q, k, cos, sin)
        qf = q.reshape(b, s, nkv, g, hd).transpose(0, 2, 1, 3, 4) \
              .reshape(b, nkv, s * g, hd)
        # stacked pool + in-kernel layer resolution (see decode body)
        o, m, l = attn_fn(qf, cache.k, cache.v, cache.block_tables,
                          cache.lengths, layer_idx=idx,
                          k_scale=cache.k_scale,
                          v_scale=cache.v_scale, scale=scale)
        o = o.reshape(b, nkv, s, g, hd).transpose(0, 2, 1, 3, 4)
        m = m.reshape(b, nkv, s, g).transpose(0, 2, 1, 3)
        l = l.reshape(b, nkv, s, g).transpose(0, 2, 1, 3)
        qg = q.reshape(b, s, nkv, g, hd)
        if quantized:
            kq, ksc = qwen2._quantize_kv(k)
            vq, vsc = qwen2._quantize_kv(v)
            k_cur = kq.astype(jnp.float32) * ksc[..., None]
            v_cur = vq.astype(jnp.float32) * vsc[..., None]
            new_k.append(kq); new_v.append(vq)
            new_ks.append(ksc); new_vs.append(vsc)
        else:
            k_cur, v_cur = k, v
            new_k.append(k.astype(cache.k.dtype))
            new_v.append(v.astype(cache.v.dtype))
        attn = merge_block_tokens(qg, k_cur, v_cur, o, m, l, scale=scale)
        attn = attn.reshape(b, s, nh * hd).astype(x.dtype)
        if is_opt:
            x = x + opt_mod._linear(attn, lp["o"])
            if not lcfg.do_layer_norm_before:
                x = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
            res = x
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"]) if lcfg.do_layer_norm_before else x
            x = res + opt_mod._linear(jax.nn.relu(opt_mod._linear(h, lp["fc1"])),
                                      lp["fc2"])
            if not lcfg.do_layer_norm_before:
                x = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        else:
            x = x + qwen2.o_proj(attn, lp, stacked, idx)
            h = rms_norm(x, lp["ln2_w"], lcfg.rms_norm_eps)
            x = x + qwen2.mlp_forward(h, lp, lcfg, stacked, idx)

    # batched physical writes: [L, B, S] at (layer, block_ids[B,S], offs[B,S])
    bs = cache.block_size
    page_pos = jnp.minimum(pos_grid // bs, cache.block_tables.shape[1] - 1)
    block_ids = jnp.maximum(
        jnp.take_along_axis(cache.block_tables, page_pos, axis=1), 0)
    offs = pos_grid % bs
    L = lcfg.num_layers
    l_idx = jnp.repeat(jnp.arange(L), b * s)
    b_flat = jnp.tile(block_ids.reshape(-1), L)
    o_flat = jnp.tile(offs.reshape(-1), L)
    k_new = cache.k.at[l_idx, b_flat, o_flat].set(
        jnp.stack(new_k).reshape(-1, nkv, hd))
    v_new = cache.v.at[l_idx, b_flat, o_flat].set(
        jnp.stack(new_v).reshape(-1, nkv, hd))
    ksc_new, vsc_new = cache.k_scale, cache.v_scale
    if quantized:
        ksc_new = cache.k_scale.at[l_idx, b_flat, o_flat].set(
            jnp.stack(new_ks).reshape(-1, nkv))
        vsc_new = cache.v_scale.at[l_idx, b_flat, o_flat].set(
            jnp.stack(new_vs).reshape(-1, nkv))

    if is_opt:
        if "ln_f_w" in lm:
            x = layer_norm(x, lm["ln_f_w"], lm["ln_f_b"])
    else:
        x = rms_norm(x, lm["ln_f_w"], lcfg.rms_norm_eps)
    logits = flamingo._unembed(params, cfg, x)                    # [B, S, vocab]
    return PagedKV(k_new, v_new, cache.block_tables, cache.lengths,
                   ksc_new, vsc_new), logits


@functools.partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k", "rounds",
                                             "eos_token_id", "sampling",
                                             "compute_dtype", "accept_sim",
                                             "attn_impl"),
                   donate_argnames=("cache", "d_k", "d_v"))
def paged_decode_spec_chunk_xattn(params, draft_params, cfg: AF2Config, draft_cfg,
                                  cache: PagedKV, media, d_k, d_v, tokens, done,
                                  rng, *, k: int, rounds: int, eos_token_id: int,
                                  sampling=None, compute_dtype=jnp.float32,
                                  accept_sim: float | None = None,
                                  attn_impl: str = "auto"):
    """Speculative decoding for the PAGED xattn engine: the shared spec round
    (engine.spec_chunk_rounds) with a text-only Qwen2 draft and the k+1-block
    verify through pages (_xattn_paged_verify). sampling=None -> greedy rule;
    static SamplingParams -> Leviathan sampled rule."""
    from audio_flamingo_tpu.runtime.engine import spec_chunk_rounds

    return spec_chunk_rounds(
        draft_params, draft_cfg, cache, d_k, d_v, tokens, done, rng,
        k=k, rounds=rounds, eos_token_id=eos_token_id,
        compute_dtype=compute_dtype, nv=cfg.lm.vocab_size,
        verify=lambda c, seq: _xattn_paged_verify(params, cfg, c, media, seq,
                                                  compute_dtype, attn_impl),
        set_lengths=lambda c, nl: c._replace(lengths=nl),
        sampling=sampling, accept_sim=accept_sim)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "eos_token_id",
                                             "compute_dtype", "mixed_sampling",
                                             "want_logprobs", "use_min_new",
                                             "use_penalty", "ngram_ns",
                                             "attn_impl"),
                   donate_argnames=("cache", "hist"))
def paged_decode_chunk_xattn(params, cfg: AF2Config, cache: PagedKV, media, tokens,
                             done, rng, rows, min_left, hist=None, *, chunk: int,
                             eos_token_id: int, compute_dtype=jnp.float32,
                             mixed_sampling: bool = False,
                             want_logprobs: bool = False, use_min_new: bool = False,
                             use_penalty: bool = False, ngram_ns: tuple = (),
                             attn_impl: str = "auto"):
    """Advance all rows `chunk` steps through their pages (one host sync).

    Same contract as paged_cache.paged_decode_chunk, plus per-row media."""
    b = tokens.shape[0]
    out0 = jnp.full((b, chunk), eos_token_id, jnp.int32)
    lp0 = jnp.zeros((b, chunk), jnp.float32)
    if hist is None:
        hist = jnp.full((b, 8), -1, jnp.int32)

    def body(i, carry):
        cache, tok, done, rng, out, lp, hist = carry
        cache2, logits = _xattn_paged_step(params, cfg, cache, media, tok,
                                           compute_dtype, attn_impl)
        rng, k = jax.random.split(rng)
        nxt, lp_val, hist = engine_row_step(
            k, logits, hist, cache.lengths + 1, rows, done, min_left, i,
            eos_token_id=eos_token_id, mixed_sampling=mixed_sampling,
            want_logprobs=want_logprobs, use_min_new=use_min_new,
            use_penalty=use_penalty, ngram_ns=ngram_ns)
        if want_logprobs:
            lp = lp.at[:, i].set(lp_val)
        lengths = jnp.where(done, cache.lengths, cache2.lengths)
        cache2 = cache2._replace(lengths=lengths)
        out = out.at[:, i].set(nxt)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return cache2, nxt, done, rng, out, lp, hist

    cache, tokens, done, rng, out, lp, hist = jax.lax.fori_loop(
        0, chunk, body, (cache, tokens, done, rng, out0, lp0, hist))
    return cache, tokens, done, rng, out, lp, hist


@functools.partial(jax.jit, static_argnames=("cfg", "n_prefix_pages", "suffix_len",
                                             "compute_dtype"))
def flamingo_prefill_suffix(params, cfg: AF2Config, cache: PagedKV,
                            prefix_page_ids, suffix_ids, window_embeds,
                            prompt_len, *, n_prefix_pages: int, suffix_len: int,
                            compute_dtype=jnp.float32):
    """Prefill only a prompt's SUFFIX against prefix KV already resident in pages
    (automatic prefix caching for the xattn family).

    Unlike AF3 (audio rides placeholder positions), gated cross-attention makes
    EVERY token's output depend on the media — so prefix blocks are only shareable
    when ids AND audio match (the block keys fold in the media digest), and the
    media features are recomputed here for the suffix's xattn blocks (cheap: a few
    self-attention layers over <=30 window embeddings).

    Returns (media [B, S, d], suffix_k, suffix_v [L, 1, suffix_len, nkv, hd],
    last-token logits fp32)."""
    media = flamingo.transform_audio(params, cfg, window_embeds.astype(compute_dtype))
    sub_k, sub_v, logits = _xattn_suffix_forward(
        params, cfg, cache, prefix_page_ids, suffix_ids, media, prompt_len,
        n_prefix_pages=n_prefix_pages, suffix_len=suffix_len,
        compute_dtype=compute_dtype)
    return media, sub_k, sub_v, logits


@functools.partial(jax.jit, static_argnames=("cfg", "n_prefix_pages", "chunk_len",
                                             "compute_dtype"))
def flamingo_prefill_chunk(params, cfg: AF2Config, cache: PagedKV,
                           prefix_page_ids, chunk_ids, media, prompt_len, *,
                           n_prefix_pages: int, chunk_len: int,
                           compute_dtype=jnp.float32):
    """One chunk of a CHUNKED xattn prefill against already-filled pages.

    Like flamingo_prefill_suffix but media is precomputed once at chunk-prefill
    start (the CLAP transform need not rerun per chunk). Returns
    (chunk_k, chunk_v, last-token logits of this chunk)."""
    return _xattn_suffix_forward(params, cfg, cache, prefix_page_ids, chunk_ids,
                                 media, prompt_len, n_prefix_pages=n_prefix_pages,
                                 suffix_len=chunk_len, compute_dtype=compute_dtype)


def _xattn_suffix_forward(params, cfg: AF2Config, cache: PagedKV, prefix_page_ids,
                          suffix_ids, media, prompt_len, *, n_prefix_pages: int,
                          suffix_len: int, compute_dtype):
    """Shared body of flamingo_prefill_suffix/_chunk: gather+dequantize the prefix
    pages into a contiguous KVCache, run the xattn LM over the suffix ids at the
    offset positions, and return (suffix_k, suffix_v, last-token logits)."""
    prefix_len = n_prefix_pages * cache.block_size
    nkv, hd = cache.k.shape[-2], cache.k.shape[-1]
    num_layers = cache.k.shape[0]
    embeds = flamingo._embed(params, cfg, suffix_ids, dtype=compute_dtype)
    k_pref = jnp.take(cache.k, prefix_page_ids, axis=1)
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
    h, new_cache = flamingo._lm_forward_with_xattn(
        params, cfg, embeds, pos, media.astype(compute_dtype), media_mask=None,
        cache=lm_cache)
    last = jnp.take_along_axis(
        h, jnp.clip(prompt_len - 1 - prefix_len, 0, suffix_len - 1)
        .reshape(1, 1, 1).astype(jnp.int32).repeat(h.shape[-1], -1), axis=1)
    logits = flamingo._unembed(params, cfg, last[:, 0])
    return new_cache.k[:, :, prefix_len:], new_cache.v[:, :, prefix_len:], logits


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _transform_media(params, cfg: AF2Config, window_embeds, compute_dtype=jnp.float32):
    return flamingo.transform_audio(params, cfg, window_embeds.astype(compute_dtype))


@dataclass
class PagedFlamingoEngine:
    """Paged scheduler for AF1/AF2: shared page pool + per-row media buffer.

    vs FlamingoEngine (slot): no per-slot worst-case KV reservation — a 5-min-audio
    prompt and short chats coexist in one pool; rows grow lazily and preempt to host
    under pressure (vLLM swap semantics), like the AF3 PagedEngine. With
    prefix_cache=True, full prompt blocks are shared across requests (keys hash
    ids + the media digest — xattn makes every position audio-dependent)."""

    params: dict
    cfg: AF2Config
    num_rows: int = 4
    num_blocks: int = 64
    block_size: int = 64
    max_blocks_per_seq: int = 8
    chunk: int = 16
    eos_token_id: int = -1
    sampling: SamplingParams = SamplingParams()
    compute_dtype: object = jnp.float32
    seed: int = 0
    kv_dtype: object = None          # jnp.int8 -> int8 page pool
    preempt: bool = True
    prefix_cache: bool = False       # share full prompt blocks (ids+media keyed)
    prefill_chunk: int = 0           # >0: Sarathi-style chunked prefill (tokens,
    #                                  multiple of block_size): long xattn prompts
    #                                  prefill one chunk per round, decode between
    n_media: int = 1
    windows_per_media: int = 1
    metrics: object = None
    # speculative decoding (greedy or Leviathan sampled; see
    # paged_decode_spec_chunk_xattn). Requires preempt=False (the draft's
    # dense rows are not swapped).
    draft_params: dict | None = None
    draft_cfg: object = None
    spec_k: int = 4
    spec_rounds: int = 4
    spec_accept_sim: float | None = None
    # acceptance guardrail (engine.record_spec_stats docstring): auto-disable
    # speculation when the live acceptance estimate sits below break-even
    spec_guard: bool = True
    spec_guard_min_accept: float = 0.5
    spec_guard_warmup: int = 64
    spec_disabled: bool = False
    # paged-attention implementation: "auto" picks dense-gather XLA for small
    # bf16 pools (a pallas_call costs ~27 us FIXED; 36 calls/step outweigh the
    # dense reads they save at 3B/2048-ctx pools) and the Pallas kernel for
    # large or int8 pools; "kernel"/"dense" pin either (_paged_attn_fn)
    attn_impl: str = "auto"

    def __post_init__(self):
        lcfg = self.cfg.lm
        if self.draft_params is not None:
            assert self.draft_cfg is not None
            assert not self.preempt, \
                "speculative paged serving requires preempt=False"
            from audio_flamingo_tpu.runtime.engine import init_slot_cache

            self.d_cache = init_slot_cache(self.draft_cfg, self.num_rows,
                                           self.capacity, self.compute_dtype)
        nkv = lcfg.num_heads if flamingo._is_opt(self.cfg) \
            else lcfg.num_kv_heads
        hd = (lcfg.hidden_size // lcfg.num_heads) if flamingo._is_opt(self.cfg) \
            else lcfg.resolved_head_dim()
        dtype = self.kv_dtype or self.compute_dtype
        shape = (lcfg.num_layers, self.num_blocks, self.block_size, nkv, hd)
        scales = jnp.ones(shape[:-1], jnp.float32) if dtype == jnp.int8 else None
        self.cache = PagedKV(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                             jnp.full((self.num_rows, self.max_blocks_per_seq), -1,
                                      jnp.int32),
                             jnp.zeros((self.num_rows,), jnp.int32),
                             scales, None if scales is None else scales.copy())
        assert self.prefill_chunk % self.block_size == 0, \
            "prefill_chunk must be a multiple of block_size"
        self.allocator = BlockAllocator(self.num_blocks, reserve=1)  # 0 = trash page
        self.store = PrefixStore() if self.prefix_cache else None
        self.prefilling: dict | None = None   # at most one chunked prefill in flight
        self.tables_np = np.full((self.num_rows, self.max_blocks_per_seq), -1, np.int32)
        self.lengths_np = np.zeros((self.num_rows,), np.int32)
        s_media = self.n_media * self.windows_per_media
        self.media = jnp.zeros((self.num_rows, s_media, self.cfg.audio_embed_dim),
                               self.compute_dtype)
        self.tokens = jnp.full((self.num_rows,), self.eos_token_id, jnp.int32)
        self.done = jnp.ones((self.num_rows,), bool)
        self.rng = jax.random.PRNGKey(self.seed)
        self.queue: deque[FlamingoRequest] = deque()
        # row -> (request, private pages, held prefix-store keys)
        self.active: dict[int, tuple[FlamingoRequest, list[int], list]] = {}
        self.finished: dict[str, list[int]] = {}
        self.row_params: list[SamplingParams] = [self.sampling] * self.num_rows
        self.rows = row_sampling(self.row_params)
        self.hist = jnp.full((self.num_rows, self.capacity), -1, jnp.int32)
        self.swapped: dict[str, dict] = {}
        self.preemptions = 0
        self.request_metrics: dict[str, dict] = {}

    @property
    def capacity(self) -> int:
        return self.max_blocks_per_seq * self.block_size

    def _speculating(self) -> bool:
        return (self.draft_params is not None and not self.spec_disabled
                and self.sampling.greedy
                and self.sampling.repetition_penalty == 1.0
                and self.sampling.no_repeat_ngram_size == 0
                and self.sampling.min_new_tokens == 0)

    def _spec_sampled(self) -> bool:
        return (self.draft_params is not None and not self.spec_disabled
                and not self.sampling.greedy
                and self.sampling.repetition_penalty == 1.0
                and self.sampling.no_repeat_ngram_size == 0
                and self.sampling.min_new_tokens == 0)

    def submit(self, req: FlamingoRequest) -> None:
        # a prompt longer than row capacity would pad by a NEGATIVE amount deep in
        # _admit (after pages were allocated) — reject loudly at the boundary
        assert req.ids.shape[1] <= self.capacity, (
            f"prompt ({req.ids.shape[1]} tokens) exceeds row capacity "
            f"({self.capacity} = max_blocks_per_seq * block_size)")
        spec = self._speculating() or self._spec_sampled()
        if req.sampling is not None and spec:
            assert req.sampling == self.sampling, \
                ("the speculative xattn path applies the ENGINE's sampling to "
                 "every row; per-request sampling must equal it")
        assert not (spec and (req.min_new_tokens or req.stop or req.logprobs)), \
            "min_new_tokens/stop/logprobs are not supported on the speculative path"
        _start_request_metrics(req)
        self.queue.append(req)

    def submit_beam(self, req) -> None:
        """Queue an AF1/AF2 beam-search request, served by a BeamLane time-
        sliced against paged xattn decode rounds (the lane owns its K dense
        cache rows; see PagedEngine.submit_beam for why it cannot share the
        page pool)."""
        from audio_flamingo_tpu.runtime.beam_lane import attach_beam_lane

        attach_beam_lane(self, family="xattn",
                         pad_windows=self._pad_windows).submit(req)

    @property
    def finished_beams(self) -> dict:
        from audio_flamingo_tpu.runtime.beam_lane import finished_beams

        return finished_beams(self)

    def _pad_windows(self, we: np.ndarray | None) -> jnp.ndarray:
        d = self.cfg.audio_embed_dim
        full = np.zeros((1, self.n_media, self.windows_per_media, d), np.float32)
        if we is not None:
            n, w = we.shape[1], we.shape[2]
            full[:, :n, :w] = we
        return jnp.asarray(full)

    def _free_pages(self) -> int:
        n = len(self.allocator.free)
        if self.store is not None:
            n += sum(1 for e in self.store.entries.values() if e[1] == 0)
        return n

    def _alloc(self, n: int) -> list[int]:
        short = n - len(self.allocator.free)
        if short > 0 and self.store is not None:
            self.allocator.release(self.store.evict(short))
        return self.allocator.alloc(n)

    def _seed_hist(self, row: int, req: FlamingoRequest) -> None:
        from audio_flamingo_tpu.runtime.engine import seed_history

        self.hist = seed_history(self.hist, row, self.capacity, req,
                                 req.sampling or self.sampling)

    def _draft_prefill(self, row: int, req: FlamingoRequest, bucket: int) -> None:
        """Prefill the text-only draft's dense cache for a newly activated row
        over the FULL ids (pages shared/chunk-built on the target side are
        irrelevant to the draft)."""
        from audio_flamingo_tpu.runtime.engine import draft_prefill_into_slot

        ids = jnp.asarray(req.ids)
        t = ids.shape[1]
        if bucket != t:
            ids = jnp.concatenate(
                [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                axis=1)
        self.d_cache = draft_prefill_into_slot(
            self.draft_params, self.draft_cfg, self.d_cache, row, ids,
            slot_capacity=self.capacity, compute_dtype=self.compute_dtype)

    def _step_budget(self) -> int:
        if self._speculating() or self._spec_sampled():
            return self.spec_rounds * (self.spec_k + 1)
        return self.chunk

    def _admit(self) -> None:
        from audio_flamingo_tpu.train.data import bucket_tokens

        for row in range(self.num_rows):
            if row in self.active or not self.queue:
                continue
            if self.prefilling is not None and self.prefilling["row"] == row:
                continue
            req = self.queue[0]
            if req.request_id in self.swapped:
                if not self._resume_row(req, row):
                    return
                continue
            t = req.ids.shape[1]
            bs = self.block_size
            bucket = min(max(bucket_tokens(t), bs), self.capacity)
            bucket = -(-bucket // bs) * bs
            n_prompt = bucket // bs

            # prefix-cache lookup: keys hash ids + media digest (xattn makes every
            # position audio-dependent); hit run rounded DOWN to a power of two
            keys: list = []
            n_hit = 0
            if self.store is not None:
                import hashlib

                ids_np = np.asarray(req.ids[0])
                media_digest = None
                if req.window_embeds is not None:
                    media_digest = hashlib.blake2b(
                        np.ascontiguousarray(req.window_embeds).tobytes(),
                        digest_size=16).digest()
                keys = _block_keys(ids_np, bs, media_digest, 0)
                run = min(self.store.longest_run(keys), (t - 1) // bs)
                n_hit = 1 << (run.bit_length() - 1) if run > 0 else 0

            start0 = n_hit * bs
            if self.prefill_chunk and bucket - start0 > self.prefill_chunk:
                # one chunked prefill at a time; a failed start (pool short)
                # also stops admission so FIFO order holds
                if (self.prefilling is not None
                        or not self._start_chunked_prefill(req, row, t, bucket,
                                                           n_hit, keys)):
                    return
                continue

            headroom = 1 if n_prompt < self.max_blocks_per_seq else 0
            if self._free_pages() < n_prompt - n_hit + headroom:
                return  # pool exhausted; wait
            self.queue.popleft()
            held: list = list(keys[:n_hit])
            prefix_pages = self.store.acquire(held) if n_hit else []
            blocks = self._alloc(n_prompt - n_hit)
            ids = jnp.asarray(req.ids)
            prompt_len = None
            if bucket != t:
                ids = jnp.concatenate(
                    [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                    axis=1)
                prompt_len = jnp.asarray(t, jnp.int32)
            wins = self._pad_windows(req.window_embeds)
            if n_hit:
                start = n_hit * bs
                media, sub_k, sub_v, logits = flamingo_prefill_suffix(
                    self.params, self.cfg, self.cache,
                    jnp.asarray(prefix_pages, jnp.int32), ids[:, start:], wins,
                    jnp.asarray(t, jnp.int32), n_prefix_pages=n_hit,
                    suffix_len=bucket - start, compute_dtype=self.compute_dtype)
                self.cache = paged_install_pages(
                    self.cache, sub_k, sub_v, jnp.asarray(blocks, jnp.int32),
                    self.cfg.lm, compute_dtype=self.compute_dtype)
            else:
                sub_cache, media, logits = flamingo.prefill(
                    self.params, self.cfg, ids, wins, bucket, self.compute_dtype,
                    prompt_len=prompt_len)
                self.cache = paged_install_pages(
                    self.cache, sub_cache.k, sub_cache.v,
                    jnp.asarray(blocks, jnp.int32), self.cfg.lm,
                    compute_dtype=self.compute_dtype)
            table_pages = prefix_pages + blocks
            # register this prompt's full blocks for future sharing
            if self.store is not None:
                for i in range(n_hit, t // bs):
                    if self.store.register(keys[i], table_pages[i]):
                        blocks.remove(table_pages[i])
                        held.append(keys[i])
            self.media = self.media.at[row].set(
                media[0].astype(self.media.dtype))
            self.tables_np[row] = -1
            self.tables_np[row, :n_prompt] = table_pages
            self.lengths_np[row] = t
            self.rng, k = jax.random.split(self.rng)
            first, finished, req_sampling = _emit_first_token(self, req, logits, k)
            if finished:
                self.allocator.release(blocks)
                if self.store is not None and held:
                    self.store.release(held)
                self.tables_np[row] = -1
                self.lengths_np[row] = 0
                continue
            self.row_params[row] = req_sampling
            self.rows = row_sampling(self.row_params)
            self._seed_hist(row, req)
            if self._speculating() or self._spec_sampled():
                self._draft_prefill(row, req, bucket)
            self.tokens = self.tokens.at[row].set(first)
            self.done = self.done.at[row].set(False)
            self.active[row] = (req, blocks, held)

    def _start_chunked_prefill(self, req: FlamingoRequest, row: int, t: int,
                               bucket: int, n_hit: int, keys: list) -> bool:
        """Reserve a row + pages, transform media ONCE, and stage a chunked xattn
        prefill; the LM then advances one chunk per engine round (_prefill_step)
        so active rows keep decoding in between. Returns False when the pool
        cannot hold the covered pages yet."""
        bs = self.block_size
        start0 = n_hit * bs
        n_chunks = -(-(t - start0) // self.prefill_chunk)
        ce = min(start0 + n_chunks * self.prefill_chunk, bucket)
        headroom = 1 if ce // bs < self.max_blocks_per_seq else 0
        if self._free_pages() < (ce - start0) // bs + headroom:
            return False
        self.queue.popleft()
        held: list = list(keys[:n_hit])
        prefix_pages = self.store.acquire(held) if n_hit else []
        own = self._alloc((ce - start0) // bs)
        ids = jnp.asarray(req.ids)
        if bucket != t:
            ids = jnp.concatenate(
                [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                axis=1)
        media = _transform_media(self.params, self.cfg,
                                 self._pad_windows(req.window_embeds),
                                 self.compute_dtype)
        self.prefilling = dict(req=req, row=row, t=t, bucket=bucket, n_hit=n_hit,
                               keys=keys, held=held, prefix_pages=prefix_pages,
                               own=own, ids=ids, media=media, done=start0, ce=ce)
        return True

    def _prefill_step(self) -> None:
        """Advance the in-flight chunked prefill by ONE chunk."""
        st = self.prefilling
        if st is None:
            return
        bs = self.block_size
        start, ce = st["done"], st["ce"]
        end = min(start + self.prefill_chunk, ce)
        table_pages = st["prefix_pages"] + st["own"]
        n_pref = start // bs
        plen = st["t"] if end >= st["t"] else end
        sub_k, sub_v, logits = flamingo_prefill_chunk(
            self.params, self.cfg, self.cache,
            jnp.asarray(table_pages[:n_pref], jnp.int32),
            st["ids"][:, start:end], st["media"], jnp.asarray(plen, jnp.int32),
            n_prefix_pages=n_pref, chunk_len=end - start,
            compute_dtype=self.compute_dtype)
        self.cache = paged_install_pages(
            self.cache, sub_k, sub_v,
            jnp.asarray(table_pages[n_pref: end // bs], jnp.int32),
            self.cfg.lm, compute_dtype=self.compute_dtype)
        st["done"] = end
        if end < st["t"]:
            return
        # final chunk: register shareable blocks, emit first token, activate
        row, req, t = st["row"], st["req"], st["t"]
        blocks, held, keys = st["own"], st["held"], st["keys"]
        self.prefilling = None
        if self.store is not None:
            for i in range(st["n_hit"], t // bs):
                if self.store.register(keys[i], table_pages[i]):
                    blocks.remove(table_pages[i])
                    held.append(keys[i])
        self.media = self.media.at[row].set(st["media"][0].astype(self.media.dtype))
        self.tables_np[row] = -1
        self.tables_np[row, :len(table_pages)] = table_pages
        self.lengths_np[row] = t
        self.rng, k = jax.random.split(self.rng)
        first, finished, req_sampling = _emit_first_token(self, req, logits, k)
        if finished:
            self.allocator.release(blocks)
            if self.store is not None and held:
                self.store.release(held)
            self.tables_np[row] = -1
            self.lengths_np[row] = 0
            return
        self.row_params[row] = req_sampling
        self.rows = row_sampling(self.row_params)
        self._seed_hist(row, req)
        if self._speculating() or self._spec_sampled():
            self._draft_prefill(row, req, st["bucket"])
        self.tokens = self.tokens.at[row].set(first)
        self.done = self.done.at[row].set(False)
        self.active[row] = (req, blocks, held)

    def _preempt_row(self, row: int) -> None:
        req, blocks, held = self.active.pop(row)
        bs = self.block_size
        n_tok = int(self.lengths_np[row])
        n_pages = -(-n_tok // bs)
        p2 = 1 << max(0, (n_pages - 1).bit_length())
        ids = np.zeros((p2,), np.int32)
        ids[:n_pages] = self.tables_np[row, :n_pages]
        ids_j = jnp.asarray(ids)

        def fetch(pool):
            return np.asarray(jnp.take(pool, ids_j, axis=1))[:, :n_pages]

        sw = dict(n_tok=n_tok, last=int(np.asarray(self.tokens)[row]),
                  k=fetch(self.cache.k), v=fetch(self.cache.v), ks=None, vs=None,
                  media=np.asarray(self.media[row]))
        if self.cache.quantized:
            sw["ks"] = fetch(self.cache.k_scale)
            sw["vs"] = fetch(self.cache.v_scale)
        self.swapped[req.request_id] = sw
        self.preemptions += 1
        self.allocator.release(blocks)
        if self.store is not None and held:
            self.store.release(held)
        self.done = self.done.at[row].set(True)
        self.tables_np[row] = -1
        self.lengths_np[row] = 0
        self.queue.appendleft(req)

    def _resume_row(self, req: FlamingoRequest, row: int) -> bool:
        sw = self.swapped[req.request_id]
        bs = self.block_size
        n_pages = -(-sw["n_tok"] // bs)
        if self._free_pages() < n_pages + 1:
            return False
        self.queue.popleft()
        del self.swapped[req.request_id]
        blocks = self._alloc(n_pages)
        p2 = 1 << max(0, (n_pages - 1).bit_length())
        ids = np.zeros((p2,), np.int32)
        ids[:n_pages] = blocks

        def pad(a):
            out = np.zeros((a.shape[0], p2) + a.shape[2:], a.dtype)
            out[:, :n_pages] = a
            return jnp.asarray(out)

        self.cache = paged_restore_pages(
            self.cache, pad(sw["k"]), pad(sw["v"]),
            None if sw["ks"] is None else pad(sw["ks"]),
            None if sw["vs"] is None else pad(sw["vs"]),
            jnp.asarray(ids))
        self.media = self.media.at[row].set(jnp.asarray(sw["media"]))
        self.tables_np[row] = -1
        self.tables_np[row, :n_pages] = blocks
        self.lengths_np[row] = sw["n_tok"]
        self.row_params[row] = req.sampling or self.sampling
        self.rows = row_sampling(self.row_params)
        self._seed_hist(row, req)
        self.tokens = self.tokens.at[row].set(sw["last"])
        self.done = self.done.at[row].set(False)
        self.active[row] = (req, blocks, [])
        return True

    def _grow_pages(self) -> list[int]:
        starved: list[int] = []
        for row, (req, blocks, held) in self.active.items():
            needed = -(-(int(self.lengths_np[row]) + self._step_budget() + 1)
                       // self.block_size)
            needed = min(needed, self.max_blocks_per_seq)
            mapped = int((self.tables_np[row] >= 0).sum())
            while mapped < needed:
                if not self.allocator.free and self.store is not None:
                    self.allocator.release(self.store.evict(1))
                if not self.allocator.free:
                    break
                nb = self.allocator.alloc(1)[0]
                self.tables_np[row, mapped] = nb
                blocks.append(nb)
                mapped += 1
            if mapped < needed:
                starved.append(row)
        return starved

    def _finish_row(self, row: int) -> None:
        req, blocks, held = self.active.pop(row)
        req.done = True
        self.finished[req.request_id] = req.tokens
        _finish_request_metrics(self, req)
        self.allocator.release(blocks)
        if self.store is not None and held:
            self.store.release(held)
        self.done = self.done.at[row].set(True)
        self.tables_np[row] = -1
        self.lengths_np[row] = 0

    def step(self) -> None:
        from audio_flamingo_tpu.runtime.beam_lane import step_beam_lane

        self._admit()
        self._prefill_step()            # one chunk, then back to decoding
        starved = self._grow_pages()
        while starved and self.preempt and len(self.active) > 1:
            self._preempt_row(starved[-1])
            starved = self._grow_pages()
        for row in starved:
            self._finish_row(row)
        if not self.active:
            step_beam_lane(self)
            return
        cache = self.cache._replace(block_tables=jnp.asarray(self.tables_np),
                                    lengths=jnp.asarray(self.lengths_np))
        if self._speculating() or self._spec_sampled():
            self.rng, spec_rng = jax.random.split(self.rng)
            (self.cache, d_k, d_v, self.tokens, self.done, _rng, out,
             valid) = paged_decode_spec_chunk_xattn(
                self.params, self.draft_params, self.cfg, self.draft_cfg,
                cache, self.media, self.d_cache.k, self.d_cache.v,
                self.tokens, self.done, spec_rng,
                k=self.spec_k, rounds=self.spec_rounds,
                eos_token_id=self.eos_token_id,
                sampling=None if self._speculating() else self.sampling,
                compute_dtype=self.compute_dtype,
                accept_sim=(self.spec_accept_sim if self._speculating()
                            else None),
                attn_impl=self.attn_impl)
            self.d_cache = self.d_cache._replace(k=d_k, v=d_v)
            out = np.asarray(out)
            valid = np.asarray(valid)
            from audio_flamingo_tpu.runtime.engine import record_spec_stats

            record_spec_stats(self, valid, list(self.active),
                              self.spec_rounds, self.spec_k)
            done = np.asarray(self.done).copy()
            self.lengths_np = np.asarray(self.cache.lengths).copy()
            budget = self._step_budget()
            for row, (req, *_x) in list(self.active.items()):
                if _postprocess_chunk_row(self, req,
                                          out[row][valid[row]].tolist(), None):
                    done[row] = True
                full = self.lengths_np[row] >= self.capacity - budget - 1
                if done[row] or full or len(req.tokens) >= req.max_new_tokens:
                    self._finish_row(row)
            step_beam_lane(self)
            return
        min_left = np.zeros((self.num_rows,), np.int32)
        for row, (req, *_ignore) in self.active.items():
            want = max(req.min_new_tokens,
                       (req.sampling or self.sampling).min_new_tokens)
            min_left[row] = max(want - len(req.tokens), 0)
        active_s = [req.sampling or self.sampling
                    for req, *_x in self.active.values()]
        mixed = any(not s.greedy for s in active_s)
        want_lp = any(req.logprobs for req, *_x in self.active.values())
        use_min = bool(min_left.any())
        use_pen, ngram_ns = processor_flags(active_s)
        (self.cache, self.tokens, self.done, self.rng, out, lp,
         self.hist) = paged_decode_chunk_xattn(
            self.params, self.cfg, cache, self.media, self.tokens, self.done,
            self.rng, self.rows, jnp.asarray(min_left), self.hist,
            chunk=self.chunk, eos_token_id=self.eos_token_id,
            compute_dtype=self.compute_dtype, mixed_sampling=mixed,
            want_logprobs=want_lp, use_min_new=use_min, use_penalty=use_pen,
            ngram_ns=ngram_ns, attn_impl=self.attn_impl)
        out = np.asarray(out)
        lp = np.asarray(lp)
        done = np.asarray(self.done).copy()
        self.lengths_np = np.asarray(self.cache.lengths).copy()
        for row, (req, *_x) in list(self.active.items()):
            if _postprocess_chunk_row(self, req, out[row].tolist(),
                                      lp[row] if req.logprobs else None):
                done[row] = True
            full = self.lengths_np[row] >= self.capacity - self.chunk - 1
            if done[row] or full or len(req.tokens) >= req.max_new_tokens:
                self._finish_row(row)
        step_beam_lane(self)

    def run_until_done(self, max_rounds: int = 1000) -> dict[str, list[int]]:
        from audio_flamingo_tpu.runtime.beam_lane import beam_lane_busy

        rounds = 0
        while ((self.queue or self.active or self.prefilling is not None
                or beam_lane_busy(self))
               and rounds < max_rounds):
            self.step()
            rounds += 1
        return self.finished
