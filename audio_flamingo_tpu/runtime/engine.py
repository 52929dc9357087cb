"""Slot-based continuous-batching serving engine.

Production serving layer for the AF3 family (goes beyond the reference's single-request
scripts): B cache slots share one static KV buffer; requests prefill into free slots as
they arrive and decode advances ALL active slots together in chunks of K steps per device
dispatch (one host sync per chunk — on this machine a sync costs ~40 ms, so K amortizes
it; on local-PJRT deployments K can be 1 for lowest latency).

Static shapes throughout: per-row cache indices (`lengths`) replace the single-offset
StaticCache so rows at different positions coexist; per-row writes are vmapped
dynamic_update_slice. Numerics: engine greedy output == single-request generate.
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops import rms_norm, rope_cos_sin
from audio_flamingo_tpu.ops.sampling import (RowSampling, SamplingParams,
                                             apply_no_repeat_ngram,
                                             engine_row_step, mask_eos,
                                             processor_flags, row_sampling,
                                             sample_token)


class SlotCache(NamedTuple):
    k: jnp.ndarray        # [L, B, C, nkv, hd]
    v: jnp.ndarray
    lengths: jnp.ndarray  # [B] int32 filled length per row


def init_slot_cache(cfg, batch: int, capacity: int, dtype=jnp.bfloat16) -> SlotCache:
    hd = cfg.resolved_head_dim()
    shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, hd)
    return SlotCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                     jnp.zeros((batch,), jnp.int32))


def _rows_forward(params, cfg, embeds, positions, cache: SlotCache):
    """Decode forward with PER-ROW cache offsets. embeds [B,s,d], positions [B].

    Token i of row b lands at cache position positions[b]+i and attends kv
    positions <= positions[b]+i (writes happen before the attention read, so
    multi-token blocks — speculative verify — are causally exact per row)."""
    b, s, _ = embeds.shape
    hd = cfg.resolved_head_dim()
    pos_grid = positions[:, None] + jnp.arange(s, dtype=positions.dtype)[None]  # [B,s]
    cos, sin = rope_cos_sin(pos_grid, hd, cfg.rope_theta)

    kv_pos = jnp.arange(cache.k.shape[2])
    mask = kv_pos[None, None, None, :] <= pos_grid[:, None, :, None]  # [B,1,s,C]

    def write_rows(c, kk, idx):
        return jax.vmap(lambda cr, kr, i: jax.lax.dynamic_update_slice(cr, kr, (i, 0, 0))
                        )(c, kk, idx)

    x = embeds
    stacked, scan_layers = qwen2.split_stacked_w4(params["layers"])
    idxs = jnp.arange(cfg.num_layers)
    from audio_flamingo_tpu.ops import apply_rope, gqa_attention

    use_suffix = False
    if stacked is not None and s == 1 and b <= 8:
        from audio_flamingo_tpu.ops.pallas.quant4_block import suffix_supported

        use_suffix = suffix_supported(stacked, cfg)
    if use_suffix:
        # 2-call-per-layer fused w4 decode (ops/pallas/quant4_block.py): layer
        # i's qkv comes from layer i-1's suffix-B kernel, attention stays here
        ln1_full = params["layers"]["ln1_w"]
        qkv_bias = stacked["qkv"].get("b")
        y0 = qwen2.w4_suffix_seed(params, cfg, stacked, x)

        def body(carry, xs):
            h, y = carry
            lp, idx, ck, cv = xs

            def attend(q, k, v):
                ck2 = write_rows(ck, k.astype(ck.dtype), positions)
                cv2 = write_rows(cv, v.astype(cv.dtype), positions)
                return (gqa_attention(q, ck2.astype(q.dtype),
                                      cv2.astype(q.dtype), mask=mask),
                        (ck2, cv2))

            return qwen2.w4_suffix_layer_step(
                h, y, lp, idx, cfg=cfg, stacked=stacked, ln1_full=ln1_full,
                qkv_bias=qkv_bias, cos=cos, sin=sin, attend=attend)

        (x, _), (nk, nv) = jax.lax.scan(
            body, (x, y0), (scan_layers, idxs, cache.k, cache.v))
        x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
        return x, SlotCache(nk, nv, cache.lengths)

    def body(carry, xs):
        h = carry
        lp, idx, ck, cv = xs
        hn = rms_norm(h, lp["ln1_w"], cfg.rms_norm_eps)
        q, k, v = qwen2.qkv_proj(hn, lp, cfg, stacked, idx)
        q, k = apply_rope(q, k, cos, sin)
        ck = write_rows(ck, k.astype(ck.dtype), positions)
        cv = write_rows(cv, v.astype(cv.dtype), positions)
        attn = gqa_attention(q, ck.astype(q.dtype), cv.astype(q.dtype), mask=mask)
        h = h + qwen2.o_proj(attn.reshape(b, s, cfg.num_heads * hd), lp, stacked, idx)
        hn = rms_norm(h, lp["ln2_w"], cfg.rms_norm_eps)
        h = h + qwen2.mlp_forward(hn, lp, cfg, stacked, idx)
        return h, (ck, cv)

    x, (nk, nv) = jax.lax.scan(body, x, (scan_layers, idxs, cache.k, cache.v))
    x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
    return x, SlotCache(nk, nv, cache.lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "eos_token_id",
                                             "compute_dtype", "mixed_sampling",
                                             "want_logprobs", "use_min_new",
                                             "use_penalty", "ngram_ns"),
                   donate_argnames=("cache", "hist"))
def decode_chunk(params, cfg: AF3Config, cache: SlotCache, tokens, done, rng,
                 rows: RowSampling, min_left, hist=None, *, chunk: int,
                 eos_token_id: int, compute_dtype=jnp.bfloat16,
                 mixed_sampling: bool = False, want_logprobs: bool = False,
                 use_min_new: bool = False, use_penalty: bool = False,
                 ngram_ns: tuple = ()):
    """Advance all slots `chunk` steps.

    Returns (cache, tokens, done, rng, out [B, chunk], lp [B, chunk] fp32 logprob
    of each sampled token — the [hf] output_scores role, ~free next to the vocab
    unembed, hist).
    rows: PER-ROW sampling parameters (traced arrays — one compiled program for
    any mix of greedy/temperature/top-k/top-p across the active requests).
    min_left: [B] int32 remaining min-new-tokens per row at chunk start (EOS is
    masked while positive).
    hist: [B, H] device-resident prompt+generated history (-1 = empty), maintained
    ACROSS chunk boundaries — the [hf] input_ids the repetition-penalty / n-gram
    processors span. Row b holds cache.lengths[b]+1 valid tokens (the cache lags
    the history by the not-yet-forwarded latest token). Static use_penalty /
    ngram_ns compile the processors out entirely when no active request asks."""
    b = tokens.shape[0]
    out0 = jnp.full((b, chunk), eos_token_id, jnp.int32)
    lp0 = jnp.zeros((b, chunk), jnp.float32)
    if hist is None:
        hist = jnp.full((b, 8), -1, jnp.int32)   # unused placeholder (processors off)

    def body(i, carry):
        cache, tok, done, rng, out, lp, hist = carry
        x = qwen2.embed(params["lm"], tok[:, None], dtype=compute_dtype)
        h, cache2 = _rows_forward(params["lm"], cfg.lm, x, cache.lengths, cache)
        logits = qwen2.unembed(params["lm"], cfg.lm, h[:, 0])
        rng, k = jax.random.split(rng)
        nxt, lp_val, hist = engine_row_step(
            k, logits, hist, cache.lengths + 1, rows, done, min_left, i,
            eos_token_id=eos_token_id, mixed_sampling=mixed_sampling,
            want_logprobs=want_logprobs, use_min_new=use_min_new,
            use_penalty=use_penalty, ngram_ns=ngram_ns)
        if want_logprobs:
            lp = lp.at[:, i].set(lp_val)
        new_lengths = cache.lengths + jnp.where(done, 0, 1)
        cache2 = SlotCache(cache2.k, cache2.v, new_lengths)
        out = out.at[:, i].set(nxt)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return cache2, nxt, done, rng, out, lp, hist

    cache, tokens, done, rng, out, lp, hist = jax.lax.fori_loop(
        0, chunk, body, (cache, tokens, done, rng, out0, lp0, hist))
    return cache, tokens, done, rng, out, lp, hist


def spec_emit(props, match, correction, done, *, eos_token_id: int):
    """Emit bookkeeping shared by greedy and SAMPLED speculation: given per-row
    accept flags `match` [B, k] and the correction/bonus token [B] for the
    first-rejection position, compute the emitted run (accepted prefix +
    correction), its EOS cut, and the per-row emitted count. Returns
    (emitted [B, k+1], ok [B, k+1] emit mask, n_emitted [B], hit_eos [B])."""
    b, k = match.shape
    ar = jnp.arange(k + 1)[None]
    m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)       # [B]
    emitted = jnp.where(ar == m[:, None], correction[:, None],
                        jnp.concatenate([props, jnp.zeros((b, 1), jnp.int32)], 1))
    emit_mask = (ar <= m[:, None]) & ~done[:, None]
    is_eos = emitted == eos_token_id
    seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(jnp.int32)
    ok = emit_mask & (seen_eos == 0)
    n_emitted = jnp.sum(ok.astype(jnp.int32), axis=1)                       # [B]
    hit_eos = jnp.any(is_eos & emit_mask, axis=1)
    return emitted, ok, n_emitted, hit_eos


def spec_accept_emit(props, greedy, done, rng, r, *, accept_sim,
                     eos_token_id: int):
    """GREEDY speculative accept/rollback (slot AND paged spec chunks): accept
    the longest prefix where the draft matched the target argmax; the
    correction is the target's own token at the first mismatch. accept_sim
    (STATIC or None): Bernoulli-injection measurement mode — see
    decode_spec_chunk."""
    b, k = props.shape
    match = props == greedy[:, :k]
    if accept_sim is not None:
        match = jax.random.bernoulli(jax.random.fold_in(rng, r),
                                     accept_sim, (b, k))
    m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    correction = jnp.take_along_axis(greedy, m[:, None], axis=1)[:, 0]
    return spec_emit(props, match, correction, done, eos_token_id=eos_token_id)


def spec_sampled_accept(rng, p_t, p_d, props, done, *, eos_token_id: int):
    """Batched Leviathan rejection rule for the engines' SAMPLED speculation.

    p_t [B, k+1, V] / p_d [B, k, V]: identically-WARPED probabilities (the warp
    must match or the rule's exactness breaks — runtime/speculative.py
    _warped_probs); props [B, k]: the draft's samples. Proposal x_i is accepted
    with prob min(1, p_t(x_i)/p_d(x_i)); the first rejection resamples from the
    renormalized residual max(p_t - p_d, 0). At m == k the zero-padded draft
    row makes the residual p_t[k] itself — the all-accepted bonus sample. The
    emitted run's marginal law is exactly warped-target ancestral sampling
    (the one-token rule is analytically tested in tests/test_speculative.py).
    """
    b, k = props.shape
    k_acc, k_corr = jax.random.split(rng)
    pt_x = jnp.take_along_axis(p_t[:, :k], props[..., None], axis=-1)[..., 0]
    pd_x = jnp.take_along_axis(p_d, props[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(k_acc, (b, k))
    match = u < jnp.minimum(pt_x / jnp.maximum(pd_x, 1e-30), 1.0)
    m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)       # [B]
    p_d_ext = jnp.concatenate([p_d, jnp.zeros_like(p_d[:, :1])], axis=1)
    p_m = jnp.take_along_axis(p_t, m[:, None, None], axis=1)[:, 0]          # [B, V]
    q_m = jnp.take_along_axis(p_d_ext, m[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(p_m - q_m, 0.0)
    rs = residual.sum(axis=-1, keepdims=True)
    residual = jnp.where(rs > 1e-30, residual / jnp.maximum(rs, 1e-30), p_m)
    correction = jax.random.categorical(
        k_corr, jnp.log(jnp.maximum(residual, 1e-30)), axis=-1).astype(jnp.int32)
    return spec_emit(props, match, correction, done, eos_token_id=eos_token_id)


def spec_chunk_rounds(draft_params, draft_cfg, cache, d_k, d_v, tokens, done,
                      rng, *, k: int, rounds: int, eos_token_id: int,
                      compute_dtype, nv: int, verify, set_lengths,
                      sampling=None, accept_sim: float | None = None):
    """Run `rounds` draft/verify/accept speculative rounds — the ONE round body
    shared by every spec chunk (slot/paged × AF3/xattn, greedy and sampled).

    The DRAFT is a text-only Qwen2 LM on a dense SlotCache (d_k, d_v) sharing
    the target cache's per-row `lengths`; `verify(cache, seq [B, k+1]) ->
    (cache, logits [B, k+1, V])` is the family-specific target forward (slot
    rows, paged pool, xattn-interleaved, ...); `set_lengths(cache, lengths)`
    rebuilds the family's cache container with advanced lengths.

    sampling=None runs the GREEDY rule (spec_accept_emit — emitted tokens ==
    target-only greedy exactly; accept_sim optionally injects Bernoulli
    acceptance for the measurement harness). A non-greedy STATIC
    SamplingParams runs the Leviathan SAMPLED rule (spec_sampled_accept — one
    warp for every row; the emitted stream's marginal law is exactly
    warped-target ancestral sampling). Rollback in both: advance `lengths` by
    the accepted count; rejected cache/page slots sit beyond every row's
    length, are never attended, and are overwritten by later writes.

    Returns (cache, d_k, d_v, tokens, done, rng, out [B, rounds*(k+1)], valid).
    """
    # lazy import: speculative.py imports from this module (cycle)
    from audio_flamingo_tpu.runtime.speculative import clamp_draft_tokens

    sampled = sampling is not None and not sampling.greedy
    assert accept_sim is None or not sampled, \
        "accept_sim is a greedy-rule measurement knob (sampled acceptance is exact)"
    if sampled:
        from audio_flamingo_tpu.runtime.speculative import _warped_probs
    if rng is None:
        rng = jax.random.PRNGKey(0)

    b = tokens.shape[0]
    width = rounds * (k + 1)
    out0 = jnp.full((b, width), eos_token_id, jnp.int32)
    valid0 = jnp.zeros((b, width), bool)
    d_cache = SlotCache(d_k, d_v, cache.lengths)

    def round_body(r, carry):
        cache, d_cache, tok, done, out, valid, rng = carry
        rng, k_draft, k_rule = jax.random.split(rng, 3)

        # 1) draft proposes k tokens per row (positions lengths..lengths+k-1)
        def draft_step(i, dc):
            d_cache, tok_i, props, p_rows = dc
            # target may emit ids >= draft vocab (151936 vs 152064 real pair):
            # clamp explicitly instead of relying on JAX's clamped OOB gather
            tok_i = clamp_draft_tokens(tok_i, draft_cfg)
            x = qwen2.embed(draft_params, tok_i[:, None], dtype=compute_dtype)
            h, d_cache = _rows_forward(draft_params, draft_cfg, x,
                                       d_cache.lengths + i, d_cache)
            logits = qwen2.unembed(draft_params, draft_cfg, h[:, 0])
            if sampled:
                from audio_flamingo_tpu.runtime.speculative import pad_draft_probs
                p_d = _warped_probs(logits.astype(jnp.float32), sampling)
                nxt = jax.random.categorical(
                    jax.random.fold_in(k_draft, i),
                    jnp.log(jnp.maximum(p_d, 1e-30)), axis=-1).astype(jnp.int32)
                # real pairs differ (0.5B 151936 vs 7B 152064): q=0 beyond the
                # draft vocab keeps the Leviathan rule exact
                p_rows = p_rows.at[:, i].set(pad_draft_probs(p_d, nv))
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return d_cache, nxt, props.at[:, i].set(nxt), p_rows

        props0 = jnp.zeros((b, k), jnp.int32)
        pd0 = jnp.zeros((b, k, nv if sampled else 1), jnp.float32)
        d_cache, _, props, p_d = jax.lax.fori_loop(
            0, k, draft_step, (d_cache, tok, props0, pd0))

        # 1b) write the LAST proposal's KV into the draft cache. The k draft
        # steps fed seq[0..k-1] = (tok, props[:-1]) — props[k-1] was produced
        # but never processed, so its slot (lengths+k) stayed unwritten. After
        # a FULL accept that token becomes permanent context and the draft
        # would attend a garbage slot FOREVER (measured: target-as-draft
        # REAL-compare acceptance 0.77-0.85 at f32 / 0.36 on the bf16 7B,
        # where exact arithmetic says 1.0; greedy OUTPUT was never wrong — the
        # verify corrects everything — which is why no exactness test saw it).
        # For partial accepts the slot lies beyond new_lengths, is never
        # attended, and is overwritten later — the write is always safe.
        last = clamp_draft_tokens(props[:, k - 1], draft_cfg)
        x_last = qwen2.embed(draft_params, last[:, None], dtype=compute_dtype)
        _, d_cache = _rows_forward(draft_params, draft_cfg, x_last,
                                   d_cache.lengths + k, d_cache)

        # 2) target verifies the k+1 block per row at its own offset
        seq = jnp.concatenate([tok[:, None], props], axis=1)         # [B, k+1]
        cache, logits = verify(cache, seq)                           # [B, k+1, V]

        # 3) per-row acceptance + correction/bonus token + EOS cut
        if sampled:
            p_t = _warped_probs(logits.astype(jnp.float32), sampling)
            emitted, ok, n_emitted, hit_eos = spec_sampled_accept(
                k_rule, p_t, p_d, props, done, eos_token_id=eos_token_id)
        else:
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emitted, ok, n_emitted, hit_eos = spec_accept_emit(
                props, greedy, done, k_rule, r, accept_sim=accept_sim,
                eos_token_id=eos_token_id)
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(ok, emitted, eos_token_id), (0, r * (k + 1)))
        valid = jax.lax.dynamic_update_slice(valid, ok, (0, r * (k + 1)))

        new_lengths = cache.lengths + n_emitted
        cache = set_lengths(cache, new_lengths)
        d_cache = SlotCache(d_cache.k, d_cache.v, new_lengths)
        cur = jnp.take_along_axis(emitted, jnp.maximum(n_emitted - 1, 0)[:, None],
                                  axis=1)[:, 0]
        tok = jnp.where(done | (n_emitted == 0), tok, cur)
        done = jnp.logical_or(done, hit_eos)
        return cache, d_cache, tok, done, out, valid, rng

    cache, d_cache, tokens, done, out, valid, rng = jax.lax.fori_loop(
        0, rounds, round_body, (cache, d_cache, tokens, done, out0, valid0, rng))
    return cache, d_cache.k, d_cache.v, tokens, done, rng, out, valid


def _slot_verify(params, cfg: AF3Config, compute_dtype):
    """verify() for the slot engines: multi-token _rows_forward at per-row offsets."""

    def verify(cache, seq):
        x = qwen2.embed(params["lm"], seq, dtype=compute_dtype)
        h, cache = _rows_forward(params["lm"], cfg.lm, x, cache.lengths, cache)
        return cache, qwen2.unembed(params["lm"], cfg.lm, h)

    return verify


@functools.partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k", "rounds",
                                             "eos_token_id", "compute_dtype",
                                             "accept_sim"),
                   donate_argnames=("cache", "d_k", "d_v"))
def decode_spec_chunk(params, draft_params, cfg: AF3Config, draft_cfg, cache: SlotCache,
                      d_k, d_v, tokens, done, rng=None, *, k: int, rounds: int,
                      eos_token_id: int, compute_dtype=jnp.bfloat16,
                      accept_sim: float | None = None):
    """Batched GREEDY speculative decoding: advance ALL slots `rounds` draft/verify
    rounds in ONE device dispatch (amortizes the ~40 ms host sync like decode_chunk).
    Emitted tokens equal target-only greedy decoding exactly
    (tests/test_engine_speculative.py); the round mechanics live in
    spec_chunk_rounds.

    Returns (cache, d_k, d_v, tokens, done, out [B, rounds*(k+1)], valid same shape):
    `out[b][valid[b]]` is the ordered token stream row b emitted this dispatch.
    The draft cache is passed as bare (d_k, d_v); both caches share `cache.lengths`
    as the single per-row offset (passing two SlotCaches would donate the shared
    lengths buffer twice).

    accept_sim (STATIC, measurement harness only): when set, the per-token
    draft==target comparison is replaced by Bernoulli(accept_sim) draws from `rng`
    — every real computation (k draft steps, the verify block, accept/rollback,
    cache bookkeeping) still runs, so the measured throughput is the true engine
    rate at that acceptance without needing a trained draft (VERDICT r2 Next #1
    acceptance-sweep harness). Emitted TOKENS are then meaningless; timing only.
    """
    cache, d_k, d_v, tokens, done, _rng, out, valid = spec_chunk_rounds(
        draft_params, draft_cfg, cache, d_k, d_v, tokens, done, rng,
        k=k, rounds=rounds, eos_token_id=eos_token_id,
        compute_dtype=compute_dtype, nv=cfg.lm.vocab_size,
        verify=_slot_verify(params, cfg, compute_dtype),
        set_lengths=lambda c, nl: SlotCache(c.k, c.v, nl),
        accept_sim=accept_sim)
    return cache, d_k, d_v, tokens, done, out, valid


@functools.partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k", "rounds",
                                             "eos_token_id", "sampling",
                                             "compute_dtype"),
                   donate_argnames=("cache", "d_k", "d_v"))
def decode_spec_chunk_sampled(params, draft_params, cfg: AF3Config, draft_cfg,
                              cache: SlotCache, d_k, d_v, tokens, done, rng, *,
                              k: int, rounds: int, eos_token_id: int,
                              sampling, compute_dtype=jnp.bfloat16):
    """Batched SAMPLED speculative decoding (Leviathan rejection sampling).

    Like decode_spec_chunk but for non-greedy engines: the draft SAMPLES from
    its warped distribution and spec_sampled_accept applies the per-row
    accept/residual-resample rule — the emitted stream's marginal law is
    exactly warped-target ancestral sampling (tests/test_spec_sampled_engine.py).

    `sampling` (STATIC SamplingParams) is the ONE warp applied to every row:
    the Leviathan rule needs target and draft warped identically, and the
    residual resample needs the full [B, V] distributions, so per-row warp
    mixes don't ride this path (the engine asserts requests use the engine's
    sampling). History-dependent processors (repetition penalty / n-gram) are
    excluded for the same reason as the greedy path.
    """
    return spec_chunk_rounds(
        draft_params, draft_cfg, cache, d_k, d_v, tokens, done, rng,
        k=k, rounds=rounds, eos_token_id=eos_token_id,
        compute_dtype=compute_dtype, nv=cfg.lm.vocab_size,
        verify=_slot_verify(params, cfg, compute_dtype),
        set_lengths=lambda c, nl: SlotCache(c.k, c.v, nl),
        sampling=sampling)


@functools.partial(jax.jit, static_argnames=("draft_cfg", "slot_capacity",
                                             "compute_dtype"),
                   donate_argnames=("d_cache",))
def draft_prefill_into_slot(draft_params, draft_cfg, d_cache: SlotCache, slot,
                            token_ids, *, slot_capacity: int,
                            compute_dtype=jnp.bfloat16):
    """Prefill the DRAFT LM on one request's token ids and install its KV into `slot`.

    The draft is text-only (audio embeds live in the target prompt; ids are shared,
    speculative.py:238). Right-padded prompts are safe: pad-position KV is written
    but decode overwrites every slot before attending it (generate.prefill contract).
    """
    t = token_ids.shape[1]
    sub = qwen2.init_cache(draft_cfg, 1, slot_capacity, dtype=compute_dtype)
    embeds = qwen2.embed(draft_params, token_ids, dtype=compute_dtype)
    pos = jnp.arange(t)[None]
    _, sub = qwen2.forward(draft_params, draft_cfg, embeds, pos, cache=sub,
                           is_prefill=True)
    kk = jax.lax.dynamic_update_slice(
        d_cache.k, sub.k.astype(d_cache.k.dtype), (0, slot, 0, 0, 0))
    vv = jax.lax.dynamic_update_slice(
        d_cache.v, sub.v.astype(d_cache.v.dtype), (0, slot, 0, 0, 0))
    return SlotCache(kk, vv, d_cache.lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "slot_capacity", "compute_dtype"),
                   donate_argnames=("cache",))
def prefill_into_slot(params, cfg: AF3Config, cache: SlotCache, slot, token_ids, mels,
                      *, slot_capacity: int, compute_dtype=jnp.bfloat16,
                      prompt_len: jnp.ndarray | None = None):
    """Prefill ONE request (batch 1) and install its KV into `slot`.

    Returns (cache, first-token logits [vocab]). token_ids may be right-padded to a
    shape bucket with `prompt_len` the true length (compile-count control).
    """
    t = token_ids.shape[1]
    sub_cache, logits = __import__("audio_flamingo_tpu.runtime.generate",
                                   fromlist=["prefill"]).prefill(
        params, cfg, token_ids, mels, slot_capacity, compute_dtype,
        prompt_len=prompt_len)
    # install: rows [L, 1, C, nkv, hd] -> cache[:, slot]
    k = jax.lax.dynamic_update_slice(
        cache.k, sub_cache.k.astype(cache.k.dtype), (0, slot, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, sub_cache.v.astype(cache.v.dtype), (0, slot, 0, 0, 0))
    lengths = cache.lengths.at[slot].set(
        t if prompt_len is None else prompt_len.astype(jnp.int32))
    return SlotCache(k, v, lengths), logits[0]


def seed_history(hist, row: int, capacity: int, req, sampling) -> "jnp.ndarray":
    """Seed one device-history row with the request's prompt + ALL emitted tokens
    (req.tokens already includes the first token at admission, and everything
    emitted by resume time). No-op unless the request uses a history processor."""
    if sampling.repetition_penalty == 1.0 and sampling.no_repeat_ngram_size == 0:
        return hist
    buf = np.full((capacity,), -1, np.int32)
    toks = np.concatenate([np.asarray(req.ids[0], np.int32),
                           np.asarray(req.tokens, np.int32)])[:capacity]
    buf[: len(toks)] = toks
    return hist.at[row].set(jnp.asarray(buf))


def _find_stop(tokens: list, stops) -> int | None:
    """Index AFTER the earliest full occurrence of any stop sequence, else None."""
    best = None
    for seq in stops:
        m = len(seq)
        sl = list(seq)
        for i in range(len(tokens) - m + 1):
            if tokens[i:i + m] == sl:
                end = i + m
                best = end if best is None else min(best, end)
                break
    return best


@dataclass
class Request:
    request_id: str
    ids: np.ndarray                   # [1, T]
    mels: np.ndarray | None = None
    max_new_tokens: int = 128
    sampling: SamplingParams | None = None   # None -> the engine's default
    tokens: list = field(default_factory=list)
    done: bool = False
    on_tokens: object = None   # optional callable(list[int]): streaming callback,
    #                            invoked on the scheduler thread as tokens emit
    min_new_tokens: int = 0    # EOS masked for the first N generated tokens
    stop: list | None = None   # token-id sequences; generation stops after any
    #                            (kept in the output, HF stop-strings role)
    logprobs: bool = False     # collect per-token logprobs into token_logprobs
    token_logprobs: list = field(default_factory=list)
    timer: object = None       # RequestTimer, attached at submit


def record_spec_stats(engine, valid: np.ndarray, active_rows, rounds: int,
                      k: int) -> None:
    """Accumulate speculative-acceptance observability on an engine.

    valid [B, rounds*(k+1)] is the spec chunk's emit mask. Each (active row,
    round) emits m+1 tokens for m accepted proposals, so the mean acceptance
    estimate is (emitted/round_slots - 1) / k — the live counterpart of the
    bench acceptance sweep (engine.spec_stats["acceptance_est"]; EOS'd rounds
    bias it low, exactly like production acceptance counters).

    GUARDRAIL (VERDICT r3 #5): speculation below its break-even acceptance is a
    silent throughput REGRESSION (a full-weight verify sweep costs ~one plain
    step against an int8 target already near the bandwidth roofline — measured
    break-even a ≈ 0.65 deep-draft / ≈ 0.5 shallow-draft, BENCH_r03). Once the
    live estimate has warmed up (spec_guard_warmup round-slots) and sits below
    spec_guard_min_accept, the engine flips `spec_disabled` and every later
    chunk takes the PLAIN decode path — same cache, same rows, token stream
    unchanged (speculation is output-invariant), throughput converges to plain.
    """
    st = getattr(engine, "spec_stats", None)
    if st is None:
        st = engine.spec_stats = {"emitted": 0, "round_slots": 0, "k": k}
    rows = [r for r in active_rows]
    st["emitted"] += int(valid[rows].sum()) if rows else 0
    st["round_slots"] += rounds * len(rows)
    if st["round_slots"]:
        per_round = st["emitted"] / st["round_slots"]
        st["acceptance_est"] = round(max(per_round - 1.0, 0.0) / k, 4)
    if (getattr(engine, "spec_guard", True)
            and not getattr(engine, "spec_disabled", False)
            and st["round_slots"] >= getattr(engine, "spec_guard_warmup", 64)
            and st.get("acceptance_est", 1.0)
            < getattr(engine, "spec_guard_min_accept", 0.5)):
        engine.spec_disabled = True
        st["guard_disabled"] = True


def _start_request_metrics(req: Request) -> None:
    from audio_flamingo_tpu.utils.metrics import RequestTimer

    if req.timer is None:
        req.timer = RequestTimer()  # clock starts at submit: queue wait counts


def _finish_request_metrics(engine, req: Request) -> None:
    """Record TTFT / decode tok/s / total latency for a retired request
    (SURVEY.md §5 metrics row: 'RTFx, TTFT, tokens/s per request')."""
    if req.timer is None:
        return
    m = req.timer.finish()
    engine.request_metrics[req.request_id] = m
    if getattr(engine, "metrics", None) is not None:
        engine.metrics.log(request_id=req.request_id,
                           **{k: v for k, v in m.items() if v is not None})




def _emit_first_token(engine, req: Request, logits_row, rng_key):
    """Shared admission-path bookkeeping: sample the request's FIRST token from its
    [V] prefill logits under its own SamplingParams (EOS floor applied), record
    timer/logprob/stream-callback state, and retire the request immediately on EOS.

    Returns (token, finished, req_sampling). The caller handles engine-specific
    cleanup (slot length reset / page release) when finished is True."""
    import jax as _jax

    req_sampling = req.sampling or engine.sampling
    lg = logits_row[None] if logits_row.ndim == 1 else logits_row
    # the first token's processors span the PROMPT ([hf] input_ids semantics):
    # penalty over prompt ids, n-gram ban against prompt n-grams
    prompt = jnp.asarray(req.ids, jnp.int32)
    if req_sampling.no_repeat_ngram_size > 0:
        lg = apply_no_repeat_ngram(lg, prompt,
                                   jnp.asarray(prompt.shape[1], jnp.int32),
                                   req_sampling.no_repeat_ngram_size)
    if max(req.min_new_tokens, req_sampling.min_new_tokens) >= 1:
        lg = mask_eos(lg, engine.eos_token_id, jnp.ones((1,), bool))
    # penalty applies inside sample_token (sampling only, not reported logprobs) —
    # same split as runtime.generate.decode_loop
    hist = prompt if req_sampling.repetition_penalty != 1.0 else None
    first = int(sample_token(rng_key, lg, req_sampling, token_history=hist)[0])
    req.tokens.append(first)
    if req.timer is not None:
        req.timer.first_token()
    if req.logprobs:
        logp = _jax.nn.log_softmax(lg[0].astype(jnp.float32))
        req.token_logprobs.append(float(logp[first]))
    if req.on_tokens:
        req.on_tokens([first])
    finished = first == engine.eos_token_id
    if finished:
        engine.finished[req.request_id] = req.tokens
        _finish_request_metrics(engine, req)
    return first, finished, req_sampling


def _postprocess_chunk_row(engine, req: Request, row_tokens, lp_row) -> bool:
    """Shared per-row bookkeeping after a decode chunk: budget/EOS trim, stop-
    sequence trim (BEFORE callbacks, so streams never deliver tokens that the
    trim removes from the final result), logprobs, timer, on_tokens.

    Returns True when a stop sequence fired (the caller marks the row done)."""
    budget = req.max_new_tokens - len(req.tokens)
    emitted = [int(t) for t in row_tokens[:budget]]
    if engine.eos_token_id in emitted:
        emitted = emitted[: emitted.index(engine.eos_token_id) + 1]
    prev = len(req.tokens)
    req.tokens.extend(emitted)
    hit_stop = False
    if req.stop:
        end = _find_stop(req.tokens, req.stop)
        if end is not None:
            del req.tokens[end:]
            hit_stop = True
    kept = req.tokens[prev:]
    if req.logprobs and lp_row is not None:
        req.token_logprobs.extend(float(x) for x in lp_row[: len(kept)])
    if req.timer is not None:
        req.timer.n_tokens += len(kept)
    if req.on_tokens and kept:
        req.on_tokens(kept)
    return hit_stop


@dataclass
class BatchEngine:
    """Host-side scheduler over the jitted prefill/decode-chunk pair.

    Attach `draft_params`/`draft_cfg` to enable BATCHED speculative decoding:
    greedy requests then advance via decode_spec_chunk (per-row accept/rollback)
    while emitting exactly the target-only greedy stream. Non-greedy sampling or
    repetition penalty fall back to the plain decode_chunk path automatically."""

    params: dict
    cfg: AF3Config
    num_slots: int = 4
    capacity: int = 2048
    chunk: int = 16
    eos_token_id: int = -1
    sampling: SamplingParams = SamplingParams()
    compute_dtype: object = jnp.bfloat16
    seed: int = 0
    draft_params: dict | None = None
    draft_cfg: object = None
    spec_k: int = 4
    spec_rounds: int = 4
    spec_accept_sim: float | None = None   # measurement harness: inject Bernoulli(a)
    #                                        acceptance instead of draft==target
    #                                        comparison (decode_spec_chunk docstring)
    # acceptance guardrail (record_spec_stats docstring): auto-disable speculation
    # when the live estimate sits below break-even; thresholds from BENCH_r03
    spec_guard: bool = True
    spec_guard_min_accept: float = 0.5
    spec_guard_warmup: int = 64            # round-slots observed before acting
    spec_disabled: bool = False            # set by the guard; sticky for the engine
    metrics: object = None         # optional utils.metrics.MetricsLogger sink

    def __post_init__(self):
        self.cache = init_slot_cache(self.cfg.lm, self.num_slots, self.capacity,
                                     self.compute_dtype)
        # per-row prompt+generated history (-1 = empty), device-resident across
        # chunk boundaries — feeds the repetition-penalty / n-gram processors
        self.hist = jnp.full((self.num_slots, self.capacity), -1, jnp.int32)
        self.tokens = jnp.full((self.num_slots,), self.eos_token_id, jnp.int32)
        self.done = jnp.ones((self.num_slots,), bool)
        self.rng = jax.random.PRNGKey(self.seed)
        self.queue: deque[Request] = deque()
        self.active: dict[int, Request] = {}
        self.finished: dict[str, list[int]] = {}
        self.row_params: list[SamplingParams] = [self.sampling] * self.num_slots
        self.rows = row_sampling(self.row_params)
        self.request_metrics: dict[str, dict] = {}
        self.d_cache = None
        if self.draft_params is not None:
            assert self.draft_cfg is not None
            self.d_cache = init_slot_cache(self.draft_cfg, self.num_slots,
                                           self.capacity, self.compute_dtype)

    def _speculating(self) -> bool:
        return (self.draft_params is not None and not self.spec_disabled
                and self.sampling.greedy
                and self.sampling.repetition_penalty == 1.0
                and self.sampling.no_repeat_ngram_size == 0
                and self.sampling.min_new_tokens == 0)

    def _spec_sampled(self) -> bool:
        """Non-greedy engines with a draft run Leviathan sampled speculation —
        ONE warp for every row (decode_spec_chunk_sampled docstring)."""
        return (self.draft_params is not None and not self.spec_disabled
                and not self.sampling.greedy
                and self.sampling.repetition_penalty == 1.0
                and self.sampling.no_repeat_ngram_size == 0
                and self.sampling.min_new_tokens == 0)

    def submit(self, req: Request) -> None:
        if req.sampling is not None:
            assert not self._speculating() \
                or (req.sampling.greedy
                    and req.sampling.repetition_penalty == 1.0
                    and req.sampling.no_repeat_ngram_size == 0), \
                "the speculative engine path is greedy-only (no history warpers)"
            assert not self._spec_sampled() or req.sampling == self.sampling, \
                ("sampled speculation applies ONE warp to every row; "
                 "per-request sampling must equal the engine's")
        assert not ((self._speculating() or self._spec_sampled())
                    and (req.min_new_tokens or req.stop or req.logprobs)), \
            "min_new_tokens/stop/logprobs are not supported on the speculative path"
        _start_request_metrics(req)
        self.queue.append(req)

    def submit_beam(self, req) -> None:
        """Queue a beam-search request ([hf] generate(num_beams=K) role). It is
        served by a BeamLane time-sliced against decode rounds; results appear
        in `finished_beams` as (sequences [R, max_new], scores [R])."""
        from audio_flamingo_tpu.runtime.beam_lane import attach_beam_lane

        attach_beam_lane(self, family="af3").submit(req)

    @property
    def finished_beams(self) -> dict:
        from audio_flamingo_tpu.runtime.beam_lane import finished_beams

        return finished_beams(self)

    def _fill_slots(self) -> None:
        for slot in range(self.num_slots):
            if slot in self.active or not self.queue:
                continue
            req = self.queue.popleft()
            mels = jnp.asarray(req.mels) if req.mels is not None else None
            from audio_flamingo_tpu.train.data import bucket_tokens

            ids = jnp.asarray(req.ids)
            t = ids.shape[1]
            bucket = min(bucket_tokens(t), self.capacity)
            prompt_len = None
            if bucket != t:
                ids = jnp.concatenate(
                    [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                    axis=1)
                prompt_len = jnp.asarray(t, jnp.int32)
            self.cache, logits = prefill_into_slot(
                self.params, self.cfg, self.cache, slot, ids, mels,
                slot_capacity=self.capacity, compute_dtype=self.compute_dtype,
                prompt_len=prompt_len)
            self.rng, k = jax.random.split(self.rng)
            first, finished, req_sampling = _emit_first_token(self, req, logits, k)
            if finished:
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0))
                continue
            self.row_params[slot] = req_sampling
            self.rows = row_sampling(self.row_params)
            self.hist = seed_history(self.hist, slot, self.capacity, req,
                                     req_sampling)
            if self._speculating() or self._spec_sampled():
                self.d_cache = draft_prefill_into_slot(
                    self.draft_params, self.draft_cfg, self.d_cache, slot, ids,
                    slot_capacity=self.capacity, compute_dtype=self.compute_dtype)
            self.tokens = self.tokens.at[slot].set(first)
            self.done = self.done.at[slot].set(False)
            self.active[slot] = req

    def step(self) -> None:
        """One scheduling round: admit queued requests, decode one chunk, then
        advance any beam-lane requests one bounded chunk."""
        from audio_flamingo_tpu.runtime.beam_lane import step_beam_lane

        self._fill_slots()
        if not self.active:
            step_beam_lane(self)
            return
        if self._speculating():
            self.rng, spec_rng = jax.random.split(self.rng)
            self.cache, d_k, d_v, self.tokens, self.done, out, valid = \
                decode_spec_chunk(
                    self.params, self.draft_params, self.cfg, self.draft_cfg,
                    self.cache, self.d_cache.k, self.d_cache.v,
                    self.tokens, self.done, spec_rng,
                    k=self.spec_k, rounds=self.spec_rounds,
                    eos_token_id=self.eos_token_id,
                    compute_dtype=self.compute_dtype,
                    accept_sim=self.spec_accept_sim)
            self.d_cache = SlotCache(d_k, d_v, self.d_cache.lengths)
            out = np.asarray(out)
            valid = np.asarray(valid)
            record_spec_stats(self, valid, list(self.active),
                              self.spec_rounds, self.spec_k)
            row_tokens = [out[s][valid[s]].tolist() for s in range(self.num_slots)]
            step_budget = self.spec_rounds * (self.spec_k + 1)
        elif self._spec_sampled():
            (self.cache, d_k, d_v, self.tokens, self.done, self.rng, out,
             valid) = decode_spec_chunk_sampled(
                self.params, self.draft_params, self.cfg, self.draft_cfg,
                self.cache, self.d_cache.k, self.d_cache.v,
                self.tokens, self.done, self.rng,
                k=self.spec_k, rounds=self.spec_rounds,
                eos_token_id=self.eos_token_id, sampling=self.sampling,
                compute_dtype=self.compute_dtype)
            self.d_cache = SlotCache(d_k, d_v, self.d_cache.lengths)
            out = np.asarray(out)
            valid = np.asarray(valid)
            record_spec_stats(self, valid, list(self.active),
                              self.spec_rounds, self.spec_k)
            row_tokens = [out[s][valid[s]].tolist() for s in range(self.num_slots)]
            step_budget = self.spec_rounds * (self.spec_k + 1)
        else:
            min_left = np.zeros((self.num_slots,), np.int32)
            for slot, req in self.active.items():
                want = max(req.min_new_tokens,
                           (req.sampling or self.sampling).min_new_tokens)
                min_left[slot] = max(want - len(req.tokens), 0)
            mixed = any(not (req.sampling or self.sampling).greedy
                        for req in self.active.values())
            want_lp = any(req.logprobs for req in self.active.values())
            use_min = bool(min_left.any())
            use_pen, ngram_ns = processor_flags(
                req.sampling or self.sampling for req in self.active.values())
            (self.cache, self.tokens, self.done, self.rng, out, lp,
             self.hist) = decode_chunk(
                self.params, self.cfg, self.cache, self.tokens, self.done, self.rng,
                self.rows, jnp.asarray(min_left), self.hist, chunk=self.chunk,
                eos_token_id=self.eos_token_id, compute_dtype=self.compute_dtype,
                mixed_sampling=mixed, want_logprobs=want_lp, use_min_new=use_min,
                use_penalty=use_pen, ngram_ns=ngram_ns)
            out = np.asarray(out)
            self._last_lp = np.asarray(lp)
            row_tokens = [out[s].tolist() for s in range(self.num_slots)]
            step_budget = self.chunk
        done = np.asarray(self.done).copy()  # writable: stop/capacity edits
        lengths = np.asarray(self.cache.lengths)
        for slot, req in list(self.active.items()):
            lp_row = self._last_lp[slot] \
                if (req.logprobs and getattr(self, "_last_lp", None) is not None) \
                else None
            if _postprocess_chunk_row(self, req, row_tokens[slot], lp_row):
                done[slot] = True
            # capacity guard: evict before per-row writes would clamp at the last slot
            if lengths[slot] >= self.capacity - step_budget - 1:
                done[slot] = True
            if done[slot] or len(req.tokens) >= req.max_new_tokens:
                req.done = True
                self.finished[req.request_id] = req.tokens
                _finish_request_metrics(self, req)
                del self.active[slot]
                self.done = self.done.at[slot].set(True)
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0))
        step_beam_lane(self)

    def run_until_done(self, max_rounds: int = 1000) -> dict[str, list[int]]:
        from audio_flamingo_tpu.runtime.beam_lane import beam_lane_busy

        rounds = 0
        while ((self.queue or self.active or beam_lane_busy(self))
               and rounds < max_rounds):
            self.step()
            rounds += 1
        return self.finished
