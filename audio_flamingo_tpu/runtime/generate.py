"""Prefill/decode generation runtime.

Semantics reference: [hf] generation/utils.py:2234 (generate orchestration) and :2688-2900
(_sample loop: forward -> last logits fp32 -> processors -> sample/argmax -> EOS tracking
via unfinished_sequences -> streamer).

TPU translation (SURVEY.md §3.4): TWO compiled functions — `prefill` (full prompt + audio,
writes the cache) and `decode_step` (1 token, cache at a static capacity) — plus a device
-side `lax.while_loop` sampler (`generate`) and a host-side streaming driver
(`generate_stream`) that yields tokens for chat/TTS streaming. The cache is donated
through the decode loop so HBM is not re-allocated per step.
"""

from __future__ import annotations

import functools
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.sampling import (SamplingParams, apply_no_repeat_ngram,
                                             mask_eos, sample_token)


class GenState(NamedTuple):
    cache: qwen2.KVCache
    cur_token: jnp.ndarray      # [B] last sampled token
    position: jnp.ndarray       # [] next absolute position
    out_tokens: jnp.ndarray     # [B, max_new_tokens]
    done: jnp.ndarray           # [B] bool
    step: jnp.ndarray           # [] int32
    rng: jax.Array


@functools.partial(jax.jit, static_argnames=("cfg", "capacity", "compute_dtype"))
def prefill(params, cfg: AF3Config, token_ids: jnp.ndarray, mels: jnp.ndarray | None,
            capacity: int, compute_dtype=jnp.bfloat16,
            prompt_len: jnp.ndarray | None = None):
    """Prompt (+audio) -> (cache, last-token logits fp32).

    token_ids: [B, T] with audio placeholders already expanded (processor contract).
    prompt_len: optional [] true length when token_ids is RIGHT-PADDED to a shape bucket
    (compile-count control: one executable per bucket instead of per length). Pad slots
    write garbage KV beyond prompt_len, but every decode step overwrites its slot BEFORE
    attending, so pads are never attendable; logits are taken at prompt_len-1 and the
    cache index rewinds to prompt_len.
    """
    b, t = token_ids.shape
    embeds = af3.build_input_embeds(params, cfg, token_ids, mels, compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache = qwen2.init_cache(cfg.lm, b, capacity, dtype=compute_dtype)
    h, cache = qwen2.forward(params["lm"], cfg.lm, embeds, pos, cache=cache,
                             is_prefill=True)
    if prompt_len is None:
        logits = qwen2.unembed(params["lm"], cfg.lm, h[:, -1])
        return cache, logits
    last = jnp.take_along_axis(
        h, jnp.full((b, 1, 1), prompt_len - 1, jnp.int32).repeat(h.shape[-1], -1), axis=1)
    logits = qwen2.unembed(params["lm"], cfg.lm, last[:, 0])
    cache = cache._replace(index=prompt_len.astype(jnp.int32))
    return cache, logits


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"), donate_argnames=("cache",))
def decode_step(params, cfg: AF3Config, cache: qwen2.KVCache, token: jnp.ndarray,
                position: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """One decode step: [B] token ids at `position` -> (cache, [B, vocab] fp32 logits)."""
    embeds = qwen2.embed(params["lm"], token[:, None], dtype=compute_dtype)
    pos = jnp.broadcast_to(position[None, None], (token.shape[0], 1)).astype(jnp.int32)
    h, cache = qwen2.forward(params["lm"], cfg.lm, embeds, pos, cache=cache)
    return cache, qwen2.unembed(params["lm"], cfg.lm, h[:, 0])


def decode_loop(first_logits, cache, prompt_len: int, decode_fn, *,
                max_new_tokens: int, eos_token_id: int, sampling: SamplingParams,
                rng: jax.Array, prompt_history: jnp.ndarray | None = None,
                stop_sequences: tuple = (), return_logprobs: bool = False,
                prompt_tokens: jnp.ndarray | None = None):
    """Model-agnostic device-side sampling loop (traced inside a jit).

    decode_fn: (cache, token [B], position []) -> (cache, logits [B, vocab]).
    prompt_history: optional [B, T] prompt ids (-1 = pad) — HF's repetition penalty
    spans prompt AND generated tokens ([hf] generation/utils.py:1090 pipeline over
    input_ids), so callers using repetition_penalty != 1.0 must pass it.
    stop_sequences: STATIC tuple of token-id tuples; a row stops after emitting any
    of them (the sequence itself is kept — [hf] StopStringCriteria semantics at the
    token level).
    Returns (tokens [B, max_new_tokens], lengths [B]) — plus logprobs
    [B, max_new_tokens] of each sampled token when return_logprobs
    ([hf] generate(output_scores=True) role).
    """
    b = first_logits.shape[0]
    rng, k0 = jax.random.split(rng)
    min_new = sampling.min_new_tokens
    ngram = sampling.no_repeat_ngram_size
    if ngram > 0:
        # the n-gram ban needs a CONTIGUOUS prompt+generated buffer ([hf]
        # NoRepeatNGramLogitsProcessor runs over input_ids) — callers pass the
        # exact (unpadded) prompt
        assert prompt_tokens is not None, \
            "no_repeat_ngram_size needs prompt_tokens (exact, unpadded prompt)"
        t0 = prompt_tokens.shape[1]
        first_logits = apply_no_repeat_ngram(
            first_logits,
            jnp.concatenate([prompt_tokens,
                             jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1),
            jnp.asarray(t0, jnp.int32), ngram)
    if min_new >= 1:
        first_logits = mask_eos(first_logits, eos_token_id, jnp.ones((b,), bool))
    first = sample_token(k0, first_logits, sampling, token_history=prompt_history)

    def token_logprob(logits, tok):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]

    out_lp0 = jnp.zeros((b, max_new_tokens), jnp.float32)
    if return_logprobs:
        out_lp0 = out_lp0.at[:, 0].set(token_logprob(first_logits, first))

    def check_stops(out, step, done):
        """done |= any stop sequence ends exactly at `step` in out."""
        for seq in stop_sequences:
            m = len(seq)
            if m > max_new_tokens:   # can never complete within the budget
                continue
            win = jax.lax.dynamic_slice(
                out, (0, jnp.maximum(step - m + 1, 0)), (b, m))      # [B, m]
            hit = jnp.all(win == jnp.asarray(seq, jnp.int32)[None], axis=1)
            done = jnp.logical_or(done, jnp.logical_and(hit, step + 1 >= m))
        return done

    state = GenState(
        cache=cache,
        cur_token=first,
        position=jnp.asarray(prompt_len, jnp.int32),
        out_tokens=jnp.full((b, max_new_tokens), eos_token_id, jnp.int32),
        done=(first == eos_token_id),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
    out0 = state.out_tokens.at[:, 0].set(first)
    state = state._replace(out_tokens=out0,
                           done=check_stops(out0, jnp.zeros((), jnp.int32),
                                            state.done))
    carry0 = (state, out_lp0)

    def cond(c):
        s = c[0]
        return jnp.logical_and(s.step + 1 < max_new_tokens, ~jnp.all(s.done))

    def body(c):
        s, out_lp = c
        cache, logits = decode_fn(s.cache, s.cur_token, s.position)
        rng, k = jax.random.split(s.rng)
        # history = prompt + tokens generated so far (untouched future slots hold eos;
        # mask them)
        hist = jnp.where(jnp.arange(max_new_tokens)[None] <= s.step, s.out_tokens, -1)
        if prompt_history is not None:
            hist = jnp.concatenate([prompt_history, hist], axis=1)
        if ngram > 0:
            buf = jnp.concatenate([prompt_tokens, s.out_tokens], axis=1)
            logits = apply_no_repeat_ngram(
                logits, buf, prompt_tokens.shape[1] + s.step + 1, ngram)
        if min_new > 0:
            logits = mask_eos(logits, eos_token_id,
                              jnp.broadcast_to(s.step + 1 < min_new, (b,)))
        nxt = sample_token(k, logits, sampling, token_history=hist)
        nxt = jnp.where(s.done, eos_token_id, nxt)
        step = s.step + 1
        out = s.out_tokens.at[:, step].set(nxt)
        if return_logprobs:
            out_lp = out_lp.at[:, step].set(
                jnp.where(s.done, 0.0, token_logprob(logits, nxt)))
        done = jnp.logical_or(s.done, nxt == eos_token_id)
        done = check_stops(out, step, done)
        return GenState(cache, nxt, s.position + 1, out, done, step, rng), out_lp

    state, out_lp = jax.lax.while_loop(cond, body, carry0)
    out = state.out_tokens
    eos_hit = out == eos_token_id
    lengths = jnp.sum(jnp.cumsum(eos_hit, axis=1) == 0, axis=1) + \
        jnp.any(eos_hit, axis=1).astype(jnp.int32)
    if stop_sequences:
        # a stop hit leaves no EOS marker in `out`; length = end of the earliest
        # stop occurrence (per sequence, first position where it completes)
        for seq in stop_sequences:
            m = len(seq)
            s_arr = jnp.asarray(seq, jnp.int32)
            # windows[i] = out[:, i:i+m] for i in 0..max_new-m
            if max_new_tokens < m:
                continue
            idx = jnp.arange(max_new_tokens - m + 1)[:, None] + jnp.arange(m)[None]
            wins = out[:, idx]                                     # [B, W, m]
            hit = jnp.all(wins == s_arr[None, None], axis=-1)      # [B, W]
            first_end = jnp.where(jnp.any(hit, axis=1),
                                  jnp.argmax(hit, axis=1) + m, max_new_tokens)
            lengths = jnp.minimum(lengths, first_end)
    lengths = jnp.minimum(lengths, max_new_tokens)
    if return_logprobs:
        return out, lengths, out_lp
    return out, lengths


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "capacity", "sampling", "eos_token_id",
                     "compute_dtype", "stop_sequences", "return_logprobs"),
)
def generate(params, cfg: AF3Config, token_ids: jnp.ndarray,
             mels: jnp.ndarray | None = None, *, max_new_tokens: int = 64,
             capacity: int = 0, eos_token_id: int = -1,
             sampling: SamplingParams = SamplingParams(), rng: jax.Array | None = None,
             compute_dtype=jnp.bfloat16, prompt_len: jnp.ndarray | None = None,
             stop_sequences: tuple = (), return_logprobs: bool = False):
    """Device-side generation: returns (tokens [B, max_new_tokens], lengths [B]).

    Positions after EOS are filled with eos_token_id. capacity=0 -> prompt+max_new rounded
    up to a 128 multiple (static shape bucket). prompt_len: true length for right-padded
    prompts — a scalar (shared length) or a [B] vector for RAGGED batches: with a
    vector, decode runs with per-row cache offsets so each row continues from its own
    prompt end (VERDICT round-1 Weak #7).
    """
    b, t = token_ids.shape
    if capacity == 0:
        capacity = -(-(t + max_new_tokens) // 128) * 128
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if prompt_len is not None and getattr(prompt_len, "ndim", 0) == 1:
        assert not stop_sequences and not return_logprobs \
            and sampling.no_repeat_ngram_size == 0, \
            "ragged batches: use the engines for stops/logprobs/ngram blocking"
        return _generate_rows(params, cfg, token_ids, mels, capacity, max_new_tokens,
                              eos_token_id, sampling, rng, compute_dtype, prompt_len)

    cache, logits = prefill(params, cfg, token_ids, mels, capacity, compute_dtype,
                            prompt_len=prompt_len)
    start = t if prompt_len is None else prompt_len

    prompt_history = None
    if sampling.repetition_penalty != 1.0:
        valid = jnp.arange(t)[None] < (prompt_len if prompt_len is not None else t)
        prompt_history = jnp.where(valid, token_ids, -1)

    def decode_fn(cache, token, position):
        return decode_step(params, cfg, cache, token, position, compute_dtype)

    if sampling.no_repeat_ngram_size > 0:
        assert prompt_len is None, \
            "no_repeat_ngram_size needs the exact prompt (no shape bucket padding)"
    return decode_loop(logits, cache, start, decode_fn, max_new_tokens=max_new_tokens,
                       eos_token_id=eos_token_id, sampling=sampling, rng=rng,
                       prompt_history=prompt_history, stop_sequences=stop_sequences,
                       return_logprobs=return_logprobs,
                       prompt_tokens=token_ids
                       if sampling.no_repeat_ngram_size > 0 else None)


def _generate_rows(params, cfg: AF3Config, token_ids, mels, capacity: int,
                   max_new_tokens: int, eos_token_id: int, sampling: SamplingParams,
                   rng, compute_dtype, prompt_len):
    """Ragged-batch generation: prompt_len [B], each row decodes from its own offset.

    Prefill runs once over the right-padded batch (pad KV beyond each row's length is
    garbage but every decode slot is overwritten before it is attended — the engine
    cache contract); decode uses the slot engine's per-row-offset forward.
    """
    from audio_flamingo_tpu.runtime.engine import SlotCache, _rows_forward

    b, t = token_ids.shape
    prompt_len = prompt_len.astype(jnp.int32)
    embeds = af3.build_input_embeds(params, cfg, token_ids, mels, compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache = qwen2.init_cache(cfg.lm, b, capacity, dtype=compute_dtype)
    h, cache = qwen2.forward(params["lm"], cfg.lm, embeds, pos, cache=cache,
                             is_prefill=True)
    last = jnp.take_along_axis(
        h, (prompt_len - 1)[:, None, None].astype(jnp.int32), axis=1)     # [B, 1, d]
    first_logits = qwen2.unembed(params["lm"], cfg.lm, last[:, 0])

    prompt_history = None
    if sampling.repetition_penalty != 1.0:
        valid = jnp.arange(t)[None] < prompt_len[:, None]
        prompt_history = jnp.where(valid, token_ids, -1)

    min_new = sampling.min_new_tokens
    if min_new >= 1:
        first_logits = mask_eos(first_logits, eos_token_id, jnp.ones((b,), bool))
    rng, k0 = jax.random.split(rng)
    first = sample_token(k0, first_logits, sampling, token_history=prompt_history)
    slot = SlotCache(cache.k, cache.v, prompt_len)
    out0 = jnp.full((b, max_new_tokens), eos_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(first)
    state = (slot, first, out0, first == eos_token_id, jnp.zeros((), jnp.int32), rng)

    def cond(s):
        return jnp.logical_and(s[4] + 1 < max_new_tokens, ~jnp.all(s[3]))

    def body(s):
        slot, tok, out, done, step, rng = s
        x = qwen2.embed(params["lm"], tok[:, None], dtype=compute_dtype)
        h, slot2 = _rows_forward(params["lm"], cfg.lm, x, slot.lengths, slot)
        logits = qwen2.unembed(params["lm"], cfg.lm, h[:, 0])
        rng, k = jax.random.split(rng)
        hist = jnp.where(jnp.arange(max_new_tokens)[None] <= step, out, -1)
        if prompt_history is not None:
            hist = jnp.concatenate([prompt_history, hist], axis=1)
        if min_new > 0:
            logits = mask_eos(logits, eos_token_id,
                              jnp.broadcast_to(step + 1 < min_new, (b,)))
        nxt = sample_token(k, logits, sampling, token_history=hist)
        nxt = jnp.where(done, eos_token_id, nxt)
        step = step + 1
        out = out.at[:, step].set(nxt)
        slot2 = SlotCache(slot2.k, slot2.v, slot.lengths + jnp.where(done, 0, 1))
        done = jnp.logical_or(done, nxt == eos_token_id)
        return slot2, nxt, out, done, step, rng

    _, _, out, _, _, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum(jnp.cumsum(out == eos_token_id, axis=1) == 0, axis=1) + \
        jnp.any(out == eos_token_id, axis=1).astype(jnp.int32)
    return out, jnp.minimum(lengths, max_new_tokens)


def generate_stream(params, cfg: AF3Config, token_ids: jnp.ndarray,
                    mels: jnp.ndarray | None = None, *, max_new_tokens: int = 128,
                    capacity: int = 0, eos_token_id: int = -1,
                    sampling: SamplingParams = SamplingParams(),
                    rng: jax.Array | None = None,
                    compute_dtype=jnp.bfloat16,
                    prompt_len: jnp.ndarray | None = None) -> Iterator[int]:
    """Host-driven streaming decode (batch 1): yields token ids as they are sampled.

    This is the streamer interface the AF3-Chat TTS head consumes
    ([hf] generation/utils.py:2855-2857 streamer.put semantics).
    """
    b, t = token_ids.shape
    assert b == 1, "streaming drives batch 1"
    if capacity == 0:
        capacity = -(-(t + max_new_tokens) // 128) * 128
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache, logits = prefill(params, cfg, token_ids, mels, capacity, compute_dtype,
                            prompt_len=prompt_len)
    import numpy as np  # local: host-side history only

    true_len = t if prompt_len is None else int(prompt_len)
    # repetition penalty spans prompt + generated (HF input_ids semantics)
    history = [int(x) for x in np.asarray(token_ids[0, :true_len])] \
        if sampling.repetition_penalty != 1.0 else None

    def hist_arr():
        return jnp.asarray(history, jnp.int32)[None] if history is not None else None

    min_new = sampling.min_new_tokens

    def pick(k, logits, generated):
        if generated < min_new:
            logits = mask_eos(logits, eos_token_id, jnp.ones((1,), bool))
        return sample_token(k, logits, sampling, token_history=hist_arr())

    rng, k = jax.random.split(rng)
    token = pick(k, logits, 0)
    position = true_len
    for i in range(max_new_tokens):
        tid = int(token[0])
        yield tid
        if tid == eos_token_id:
            return
        if history is not None:
            history.append(tid)
        cache, logits = decode_step(params, cfg, cache, token,
                                    jnp.asarray(position, jnp.int32), compute_dtype)
        rng, k = jax.random.split(rng)
        token = pick(k, logits, i + 1)
        position += 1
