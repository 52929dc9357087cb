"""Speculative decoding: a small draft LM proposes K tokens, the target verifies them in
one prefill-style forward — exact greedy equality with target-only decoding.

Decode on one chip is HBM-bound on target weights (ops/quant.py notes); speculation
amortizes one target weight-stream over up to K+1 emitted tokens. The whole
propose/verify/rollback loop runs inside one `lax.while_loop` (device-side, one host sync
per request), using the position-indexed static cache: rejected slots are simply
overwritten later and are never attended (mask is `kv_pos <= position`).

Batch 1 (speculation interacts with per-row acceptance; the batch engine covers batched
throughput serving).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config
from audio_flamingo_tpu.models import qwen2


def speculative_accept(rng: jax.Array, p_target: jnp.ndarray, p_draft: jnp.ndarray,
                       proposed: jnp.ndarray):
    """One-token speculative SAMPLING acceptance (Leviathan et al. rejection rule).

    p_target/p_draft: [vocab] probability vectors; proposed: [] draft-sampled token.
    Accept with prob min(1, p_t[x]/p_d[x]); on reject, resample from the residual
    distribution max(p_t - p_d, 0) (renormalized). The marginal law of the returned
    token is EXACTLY p_target — unit-tested analytically in tests/test_speculative.py.
    Returns (token, accepted: bool).
    """
    k1, k2 = jax.random.split(rng)
    ratio = p_target[proposed] / jnp.maximum(p_draft[proposed], 1e-30)
    accept = jax.random.uniform(k1) < jnp.minimum(ratio, 1.0)
    residual = jnp.maximum(p_target - p_draft, 0.0)
    residual = residual / jnp.maximum(residual.sum(), 1e-30)
    resampled = jax.random.categorical(k2, jnp.log(jnp.maximum(residual, 1e-30)))
    return jnp.where(accept, proposed, resampled), accept


def _warped_probs(logits: jnp.ndarray, sampling) -> jnp.ndarray:
    """Apply the sampling pipeline's distribution warp (temperature -> top-k -> top-p)
    and return probabilities. Speculative sampling must warp BOTH the draft and target
    distributions identically for the Leviathan rule to preserve the target law."""
    from audio_flamingo_tpu.ops.sampling import apply_top_k, apply_top_p

    lg = logits / jnp.maximum(sampling.temperature, 1e-6)
    lg = apply_top_k(lg, sampling.top_k)
    lg = apply_top_p(lg, sampling.top_p)
    return jax.nn.softmax(lg, axis=-1)


def clamp_draft_tokens(tok: jnp.ndarray, draft_cfg) -> jnp.ndarray:
    """Clamp token ids to the DRAFT vocab before feeding them to the draft LM.

    With a smaller-vocab draft (Qwen2.5-0.5B 151936 vs 7B 152064), the target can
    emit ids the draft's embedding table doesn't have. The emitted law stays exact
    either way (the recorded q always matches the actual proposal distribution);
    this makes the previously-implicit reliance on JAX's clamped out-of-bounds
    gather explicit. No-op for same-vocab pairs.
    """
    return jnp.minimum(tok, draft_cfg.vocab_size - 1)


def pad_draft_probs(p_d: jnp.ndarray, nv: int) -> jnp.ndarray:
    """Zero-pad draft probabilities [..., dv] up to the TARGET vocab nv.

    Real draft/target pairs genuinely differ (Qwen2.5-0.5B ships 151936 rows,
    7B ships 152064); q(x) = 0 beyond the draft vocab keeps the Leviathan rule
    exact — the draft can never propose such a token, and on rejection the
    residual max(p_t - q, 0) == p_t there, so target-only tokens arrive through
    the resample with the right law.
    """
    dv = p_d.shape[-1]
    if dv == nv:
        return p_d
    if dv > nv:
        raise ValueError(f"draft vocab {dv} exceeds target vocab {nv}")
    return jnp.pad(p_d, [(0, 0)] * (p_d.ndim - 1) + [(0, nv - dv)])


class SpecSampleState(NamedTuple):
    t_cache: qwen2.KVCache
    d_cache: qwen2.KVCache
    cur_token: jnp.ndarray    # [1]
    position: jnp.ndarray     # []
    out_tokens: jnp.ndarray   # [1, max_new + k + 1]
    n_out: jnp.ndarray        # []
    done: jnp.ndarray         # [] bool
    rng: jax.Array


@functools.partial(jax.jit, static_argnames=("cfg", "draft_cfg", "sampling", "k",
                                             "max_new_tokens", "capacity",
                                             "eos_token_id", "compute_dtype"))
def generate_speculative_sampled(params, draft_params, cfg: AF3Config,
                                 draft_cfg: Qwen2Config, token_ids, mels=None, *,
                                 rng: jax.Array, sampling, k: int = 4,
                                 max_new_tokens: int = 64, capacity: int = 0,
                                 eos_token_id: int = -1, compute_dtype=jnp.bfloat16):
    """SAMPLING-mode speculative generation (Leviathan et al. rejection sampling).

    Each round the draft SAMPLES k tokens from its warped distribution; the target
    verifies them in one forward. Proposal i is accepted with prob
    min(1, p_t(x_i)/p_d(x_i)); on the first rejection the token is resampled from the
    renormalized residual max(p_t - p_d, 0), and if all k are accepted a bonus token is
    sampled from p_t directly (the residual formula below covers both cases: the padded
    draft row is zero, so residual == p_t). The emitted sequence's marginal law is
    EXACTLY warped-target ancestral sampling — the one-token rule is unit-tested
    analytically in tests/test_speculative.py.

    Returns (tokens [1, max_new], lengths [1]). Repetition penalty is not supported in
    speculative mode (it would make p_t history-dependent inside the verify step).
    """
    from audio_flamingo_tpu.runtime.generate import prefill

    b, t = token_ids.shape
    assert b == 1, "speculative decoding drives batch 1"
    if capacity == 0:
        capacity = -(-(t + max_new_tokens + k + 1) // 128) * 128

    t_cache, t_logits = prefill(params, cfg, token_ids, mels, capacity, compute_dtype)
    d_cache = qwen2.init_cache(draft_cfg, 1, capacity, dtype=compute_dtype)
    d_embeds = qwen2.embed(draft_params, token_ids, dtype=compute_dtype)
    d_pos = jnp.arange(t)[None]
    _, d_cache = qwen2.forward(draft_params, draft_cfg, d_embeds, d_pos, cache=d_cache,
                               is_prefill=True)

    rng, k0 = jax.random.split(rng)
    p_first = _warped_probs(t_logits.astype(jnp.float32), sampling)     # [1, V]
    first = jax.random.categorical(k0, jnp.log(jnp.maximum(p_first, 1e-30)),
                                   axis=-1).astype(jnp.int32)           # [1]
    out0 = jnp.full((1, max_new_tokens + k + 1), eos_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(first)

    state = SpecSampleState(t_cache, d_cache, first, jnp.asarray(t, jnp.int32), out0,
                            jnp.asarray(1, jnp.int32), (first[0] == eos_token_id), rng)

    def cond(s: SpecSampleState):
        return jnp.logical_and(s.n_out < max_new_tokens, ~s.done)

    nv = p_first.shape[-1]

    def body(s: SpecSampleState):
        rng, k_draft, k_accept, k_corr = jax.random.split(s.rng, 4)

        # 1) draft SAMPLES k tokens, recording its warped distribution at each step
        def draft_step(i, carry):
            d_cache, tok, props, p_rows = carry
            tok = clamp_draft_tokens(tok, draft_cfg)   # target may emit ids >= draft vocab
            d_cache2, logits = _forward_tokens(draft_params, draft_cfg, d_cache,
                                               tok[:, None], s.position + i,
                                               compute_dtype)
            p_d = _warped_probs(logits[:, 0].astype(jnp.float32), sampling)  # [1, Vd]
            nxt = jax.random.categorical(
                jax.random.fold_in(k_draft, i),
                jnp.log(jnp.maximum(p_d, 1e-30)), axis=-1).astype(jnp.int32)
            p_d = pad_draft_probs(p_d, nv)                                   # [1, V]
            return (d_cache2, nxt, props.at[i].set(nxt[0]), p_rows.at[i].set(p_d[0]))

        props0 = jnp.zeros((k,), jnp.int32)
        pd0 = jnp.zeros((k, nv), jnp.float32)
        d_cache, _, props, p_d = jax.lax.fori_loop(
            0, k, draft_step, (s.d_cache, s.cur_token, props0, pd0))
        # write the LAST proposal's KV (never fed back by the k draft steps):
        # after a full accept it is permanent context and its slot would stay
        # garbage forever (see engine.spec_chunk_rounds 1b; same hole).
        d_cache, _ = _forward_tokens(
            draft_params, draft_cfg, d_cache,
            clamp_draft_tokens(props[k - 1][None], draft_cfg)[:, None],
            s.position + k, compute_dtype)

        # 2) target verifies [cur, p0..p_{k-1}] in one forward
        seq = jnp.concatenate([s.cur_token, props])[None]               # [1, k+1]
        t_cache, t_logits = _forward_tokens(params["lm"], cfg.lm, s.t_cache, seq,
                                            s.position, compute_dtype)
        p_t = _warped_probs(t_logits[0].astype(jnp.float32), sampling)  # [k+1, V]

        # 3) Leviathan acceptance: u_i < min(1, p_t(x_i)/p_d(x_i)), prefix-accepted
        idx_k = jnp.arange(k)
        pt_x = p_t[idx_k, props]
        pd_x = p_d[idx_k, props]
        u = jax.random.uniform(k_accept, (k,))
        accept = u < jnp.minimum(pt_x / jnp.maximum(pd_x, 1e-30), 1.0)
        m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))              # accepted count

        # 4) correction: residual resample at m (m == k: p_d row is zero => residual=p_t)
        p_d_ext = jnp.concatenate([p_d, jnp.zeros((1, nv), jnp.float32)], axis=0)
        residual = jnp.maximum(p_t[m] - p_d_ext[m], 0.0)
        rs = residual.sum()
        residual = jnp.where(rs > 1e-30, residual / jnp.maximum(rs, 1e-30), p_t[m])
        correction = jax.random.categorical(
            k_corr, jnp.log(jnp.maximum(residual, 1e-30))).astype(jnp.int32)

        emitted = jnp.where(jnp.arange(k + 1) == m, correction,
                            jnp.concatenate([props, jnp.zeros((1,), jnp.int32)]))
        emit_mask = jnp.arange(k + 1) <= m

        idx = s.n_out + jnp.arange(k + 1)
        seen_eos = jnp.cumsum((emitted == eos_token_id).astype(jnp.int32)) \
            - (emitted == eos_token_id).astype(jnp.int32)
        valid = emit_mask & (seen_eos == 0)
        vals = jnp.where(valid, emitted, eos_token_id)
        out = s.out_tokens.at[0, idx].set(
            jnp.where(valid, vals, s.out_tokens[0, idx]))
        n_emitted = jnp.sum(valid)

        hit_eos = jnp.any((emitted == eos_token_id) & emit_mask)
        new_pos = s.position + n_emitted
        t_cache = t_cache._replace(index=new_pos)
        d_cache = d_cache._replace(index=new_pos)
        cur = emitted[jnp.minimum(n_emitted - 1, k)][None]
        done = jnp.logical_or(hit_eos, s.n_out + n_emitted >= max_new_tokens)
        return SpecSampleState(t_cache, d_cache, cur, new_pos, out,
                               s.n_out + n_emitted, done, rng)

    state = jax.lax.while_loop(cond, body, state)
    out = state.out_tokens[:, :max_new_tokens]
    lengths = jnp.minimum(state.n_out, max_new_tokens)[None]
    pos_ids = jnp.arange(max_new_tokens)[None]
    out = jnp.where(pos_ids < lengths, out, eos_token_id)
    eos_cut = jnp.cumsum((out == eos_token_id).astype(jnp.int32), axis=1)
    keep = (eos_cut == 0) | ((out == eos_token_id) & (eos_cut == 1))
    out = jnp.where(keep, out, eos_token_id)
    n_kept = jnp.sum(jnp.cumsum(out == eos_token_id, axis=1) == 0, axis=1) + \
        jnp.any(out == eos_token_id, axis=1).astype(jnp.int32)
    return out, jnp.minimum(n_kept, max_new_tokens)


class SpecState(NamedTuple):
    t_cache: qwen2.KVCache
    d_cache: qwen2.KVCache
    cur_token: jnp.ndarray    # [1] last ACCEPTED token (already emitted)
    position: jnp.ndarray     # [] next position to write (== #tokens in context)
    out_tokens: jnp.ndarray   # [1, max_new]
    n_out: jnp.ndarray        # [] tokens emitted so far
    done: jnp.ndarray         # [] bool


def _forward_tokens(params, cfg: Qwen2Config, cache: qwen2.KVCache, tokens, start_pos,
                    compute_dtype):
    """Run `tokens` [1, n] at positions start_pos.. -> (cache', logits [1, n, vocab]).

    The returned cache has index=start_pos+n; callers roll back by replacing `index`.
    """
    n = tokens.shape[1]
    embeds = qwen2.embed(params, tokens, dtype=compute_dtype)
    pos = (start_pos + jnp.arange(n))[None]
    cache = cache._replace(index=start_pos)
    h, cache = qwen2.forward(params, cfg, embeds, pos, cache=cache)
    return cache, qwen2.unembed(params, cfg, h)


@functools.partial(jax.jit, static_argnames=("cfg", "draft_cfg", "k", "max_new_tokens",
                                             "capacity", "eos_token_id", "compute_dtype"))
def generate_speculative(params, draft_params, cfg: AF3Config, draft_cfg: Qwen2Config,
                         token_ids, mels=None, *, k: int = 4, max_new_tokens: int = 64,
                         capacity: int = 0, eos_token_id: int = -1,
                         compute_dtype=jnp.bfloat16):
    """Greedy speculative generation. Returns (tokens [1, max_new], lengths [1]).

    Output is exactly what target-only greedy decoding would produce.
    """
    from audio_flamingo_tpu.runtime.generate import prefill

    b, t = token_ids.shape
    assert b == 1, "speculative decoding drives batch 1"
    if capacity == 0:
        capacity = -(-(t + max_new_tokens + k + 1) // 128) * 128

    # prefill both models on the prompt (draft is text-only: audio embeds are scattered
    # into the TARGET prompt; the draft sees the same token ids — for AF models the
    # draft is a text LM distilled on the same tokenizer, so ids are shared)
    t_cache, t_logits = prefill(params, cfg, token_ids, mels, capacity, compute_dtype)
    d_cache = qwen2.init_cache(draft_cfg, 1, capacity, dtype=compute_dtype)
    d_embeds = qwen2.embed(draft_params, token_ids, dtype=compute_dtype)
    d_pos = jnp.arange(t)[None]
    _, d_cache = qwen2.forward(draft_params, draft_cfg, d_embeds, d_pos, cache=d_cache,
                               is_prefill=True)

    first = jnp.argmax(t_logits, -1).astype(jnp.int32)          # [1]
    out0 = jnp.full((1, max_new_tokens + k + 1), eos_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(first)

    state = SpecState(t_cache, d_cache, first, jnp.asarray(t, jnp.int32), out0,
                      jnp.asarray(1, jnp.int32), (first[0] == eos_token_id))

    def cond(s: SpecState):
        return jnp.logical_and(s.n_out < max_new_tokens, ~s.done)

    def body(s: SpecState):
        # 1) draft proposes k tokens autoregressively from s.cur_token at s.position
        def draft_step(i, carry):
            d_cache, tok, props = carry
            tok = clamp_draft_tokens(tok, draft_cfg)   # target may emit ids >= draft vocab
            d_cache2, logits = _forward_tokens(draft_params, draft_cfg, d_cache,
                                               tok[:, None], s.position + i,
                                               compute_dtype)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return d_cache2, nxt, props.at[i].set(nxt[0])

        props0 = jnp.zeros((k,), jnp.int32)
        d_cache, _, props = jax.lax.fori_loop(
            0, k, draft_step, (s.d_cache, s.cur_token, props0))
        # write the LAST proposal's KV (see engine.spec_chunk_rounds 1b)
        d_cache, _ = _forward_tokens(
            draft_params, draft_cfg, d_cache,
            clamp_draft_tokens(props[k - 1][None], draft_cfg)[:, None],
            s.position + k, compute_dtype)

        # 2) target verifies: forward [cur, p0..p_{k-1}] at positions position-? ...
        # tokens fed: cur_token + proposals[:-1]? We need target logits FOR positions
        # position..position+k, i.e. run tokens [cur, p0, .., p_{k-1}] (k+1 tokens) whose
        # KV occupy position..position+k... but cur's KV is NOT yet in the target cache
        # (prefill/verify only wrote up to position-1 plus cur handled below).
        seq = jnp.concatenate([s.cur_token, props])[None]        # [1, k+1]
        t_cache, t_logits = _forward_tokens(params["lm"], cfg.lm, s.t_cache, seq,
                                            s.position, compute_dtype)
        greedy = jnp.argmax(t_logits[0], -1).astype(jnp.int32)   # [k+1]: g_i predicts pos+i+1

        # 3) acceptance: proposal i accepted iff props[i] == greedy[i] and all before ok
        match = props == greedy[:k]
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))        # accepted proposals
        correction = greedy[m]                                   # target token after prefix
        # emitted[i] = props[i] for i < m, correction at i == m (i > m masked out below)
        emitted = jnp.where(jnp.arange(k + 1) == m, correction,
                            jnp.concatenate([props, jnp.zeros((1,), jnp.int32)]))
        emit_mask = jnp.arange(k + 1) <= m
        emit_count = m + 1

        # write emitted tokens into out at n_out.. (masked by not-done and eos cutoff)
        idx = s.n_out + jnp.arange(k + 1)
        seen_eos = jnp.cumsum((emitted == eos_token_id).astype(jnp.int32)) \
            - (emitted == eos_token_id).astype(jnp.int32)
        valid = emit_mask & (seen_eos == 0)
        vals = jnp.where(valid, emitted, eos_token_id)
        out = s.out_tokens.at[0, idx].set(
            jnp.where(valid, vals, s.out_tokens[0, idx]))
        n_emitted = jnp.sum(valid)

        hit_eos = jnp.any((emitted == eos_token_id) & emit_mask)
        new_pos = s.position + n_emitted
        # caches: target holds KV for seq at position..position+k; accepted context is
        # position..position+m (tokens cur, props[:m]); next round rewrites the rest.
        t_cache = t_cache._replace(index=new_pos)
        d_cache = d_cache._replace(index=new_pos)
        cur = emitted[jnp.minimum(n_emitted - 1, k)][None]
        done = jnp.logical_or(hit_eos, s.n_out + n_emitted >= max_new_tokens)
        return SpecState(t_cache, d_cache, cur, new_pos, out, s.n_out + n_emitted, done)

    state = jax.lax.while_loop(cond, body, state)
    out = state.out_tokens[:, :max_new_tokens]
    lengths = jnp.minimum(state.n_out, max_new_tokens)[None]
    # normalize: everything past the first EOS (or n_out) is eos_token_id
    pos_ids = jnp.arange(max_new_tokens)[None]
    out = jnp.where(pos_ids < lengths[:, None] if lengths.ndim == 1 else pos_ids <
                    lengths, out, eos_token_id)
    eos_cut = jnp.cumsum((out == eos_token_id).astype(jnp.int32), axis=1)
    keep = (eos_cut == 0) | ((out == eos_token_id) & (eos_cut == 1))
    out = jnp.where(keep, out, eos_token_id)
    n_kept = jnp.sum(jnp.cumsum(out == eos_token_id, axis=1) == 0, axis=1) + \
        jnp.any(out == eos_token_id, axis=1).astype(jnp.int32)
    return out, jnp.minimum(n_kept, max_new_tokens)
