"""TPU-native beam search: HF `_beam_search` semantics as one compiled
`lax.while_loop`.

Semantics reference: [hf] generation/utils.py:3113 `_beam_search` (the flat,
static-shaped refactor) and its helpers — `_get_top_k_continuations` (:2982,
2K-candidate rule), `_get_running_beams_for_next_iteration` (:3036),
`_update_finished_beams` (:3058, length penalty over generated length, top-K-rank
gating, merge-and-topk), `_check_early_stop_heuristic` (:2913) and
`_beam_search_has_unfinished_sequences` (:2960). Scores are fp32 log-softmax
accumulations; the first beam starts at 0 and the rest at -1e9 so step 0 expands
only beam 0 (:3240-3242).

TPU design: beams ride the batch axis (B*K cache rows, one forward per step for
all beams), the per-step beam reorder is a row gather on the KV cache (the T5X
flat-beam pattern), and every tensor is static-shaped — candidates are 2K wide,
finished beams merge through a fixed 3K top-k.

The loop body is built by `_beam_fns` over a `BeamState` carry, so the same
verified bookkeeping runs either to completion (`beam_loop`, the single-shot
`generate_beam`/`generate_beam_xattn` APIs) or a bounded number of steps per
call (`beam_advance*`, the serving engines' beam lane — runtime/beam_lane.py —
which time-slices beam requests against continuous-batching decode rounds).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops.sampling import apply_no_repeat_ngram
from audio_flamingo_tpu.runtime.generate import prefill

NEG = -1.0e9


class BeamState(NamedTuple):
    """Carry of the beam while_loop — pausable between engine rounds.

    i is generated-steps-so-far; t the TRUE prompt length ([] int32, traced so
    engine-bucketed right-padded prompts share one executable); hist a
    [B*K, t_pad+max_new] contiguous prompt+generated buffer feeding the n-gram
    processor ([B*K, 1] dummy when no_repeat_ngram is off)."""

    i: jnp.ndarray
    t: jnp.ndarray
    cache: object              # KVCache pytree, batch-beam rows at axis 1
    logits: jnp.ndarray        # [B*K, V] logits of the NEXT step
    run_seq: jnp.ndarray       # [B, K, max_new]
    run_sc: jnp.ndarray        # [B, K] f32
    fin_seq: jnp.ndarray
    fin_sc: jnp.ndarray
    is_fin: jnp.ndarray
    heur_ok: jnp.ndarray       # [B, 1] early-stop heuristic gate
    alive: jnp.ndarray         # [] bool loop-level termination
    hist: jnp.ndarray


def _take_beams(x, idx):
    """Gather beams along axis 1 ([hf] _gather_beams)."""
    full_idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, full_idx, axis=1)


def beam_state_init(first_logits, cache, *, num_beams: int, max_new_tokens: int,
                    eos_token_id: int, prompt_len,
                    prompt_tokens: jnp.ndarray | None = None,
                    no_repeat_ngram_size: int = 0) -> BeamState:
    """Build the step-0 carry from prefill logits and a B*K-row cache."""
    b, _ = first_logits.shape
    K = num_beams
    logits = jnp.repeat(first_logits, K, axis=0)                  # [B*K, V]
    pad = eos_token_id if eos_token_id >= 0 else 0
    run_seq = jnp.full((b, K, max_new_tokens), pad, jnp.int32)
    run_sc = jnp.zeros((b, K), jnp.float32).at[:, 1:].set(NEG)    # beam 0 only
    if no_repeat_ngram_size > 0:
        assert prompt_tokens is not None, "no_repeat_ngram_size needs prompt_tokens"
        tp = prompt_tokens.astype(jnp.int32)                      # [B, t_pad]
        hist = jnp.zeros((b * K, tp.shape[1] + max_new_tokens), jnp.int32)
        hist = hist.at[:, : tp.shape[1]].set(jnp.repeat(tp, K, axis=0))
    else:
        hist = jnp.zeros((b * K, 1), jnp.int32)
    return BeamState(
        i=jnp.zeros((), jnp.int32),
        t=jnp.asarray(prompt_len, jnp.int32),
        cache=cache, logits=logits, run_seq=run_seq, run_sc=run_sc,
        fin_seq=run_seq, fin_sc=jnp.full((b, K), NEG, jnp.float32),
        is_fin=jnp.zeros((b, K), bool), heur_ok=jnp.ones((b, 1), bool),
        alive=jnp.ones((), bool), hist=hist)


def _beam_fns(decode_fn, *, num_beams: int, max_new_tokens: int,
              eos_token_id: int, length_penalty: float, early_stopping,
              min_new_tokens: int, no_repeat_ngram_size: int, do_sample: bool,
              temperature: float, loop_rng):
    """(cond, body) over BeamState — the HF `_beam_search` bookkeeping
    documented at module top. decode_fn: (cache, tokens [B*K], position [])
    -> (cache, logits [B*K, V])."""
    K, K2 = num_beams, 2 * num_beams
    top_mask = jnp.arange(K2) < K                                 # 2K-candidate rule

    def cond(s: BeamState):
        return jnp.logical_and(s.i < max_new_tokens, s.alive)

    def body(s: BeamState) -> BeamState:
        i, t = s.i, s.t
        b = s.run_seq.shape[0]
        vocab = s.logits.shape[-1]
        bk_off = (jnp.arange(b) * K)[:, None]
        lp = jax.nn.log_softmax(s.logits.astype(jnp.float32), axis=-1)
        if no_repeat_ngram_size > 0:
            # [hf] _beam_search applies the processor on the log-probs of each
            # RUNNING beam before candidate selection (prompt + generated history)
            lp = apply_no_repeat_ngram(lp, s.hist, t + i, no_repeat_ngram_size)
        if min_new_tokens > 0 and eos_token_id >= 0:
            col = lp[:, eos_token_id]
            lp = lp.at[:, eos_token_id].set(jnp.where(i < min_new_tokens, NEG, col))
        if do_sample and temperature != 1.0:
            lp = lp / max(temperature, 1e-6)   # [hf] warpers run on the log-probs
        lp = lp.reshape(b, K, vocab)
        acc = (lp + s.run_sc[:, :, None]).reshape(b, K * vocab)

        # top-2K candidates across all beams ([hf] _get_top_k_continuations);
        # do_sample replaces argmax-top-k with multinomial WITHOUT replacement
        # over softmax(acc) — exactly the Gumbel-top-k trick (scores stay acc)
        if do_sample:
            g = jax.random.gumbel(jax.random.fold_in(loop_rng, i), acc.shape)
            _, idx = jax.lax.top_k(acc + g, K2)
            cand_sc = jnp.take_along_axis(acc, idx, axis=1)       # [B, 2K]
        else:
            cand_sc, idx = jax.lax.top_k(acc, K2)                 # [B, 2K]
        parent = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)
        cand_seq = _take_beams(s.run_seq, parent).at[:, :, i].set(tok)
        # stopping criteria: EOS or max length reached with this token
        hits = jnp.logical_or(tok == eos_token_id, i + 1 >= max_new_tokens)

        # next running beams: best K that did NOT finish ([hf] :3036)
        sc_running = cand_sc + hits.astype(jnp.float32) * NEG
        new_run_sc, keep = jax.lax.top_k(sc_running, K)
        new_run_seq = _take_beams(cand_seq, keep)
        parent_keep = jnp.take_along_axis(parent, keep, axis=1)   # [B, K]
        cur_tok = jnp.take_along_axis(tok, keep, axis=1)

        # finished update ([hf] _update_finished_beams): length penalty over the
        # GENERATED length, only top-K-rank candidates may finalize, merge+topk
        flp = cand_sc / ((i + 1.0) ** length_penalty)
        if early_stopping is True:
            full_mask = jnp.all(s.is_fin, axis=1, keepdims=True)
            flp = flp + full_mask.astype(jnp.float32) * NEG
        flp = flp + (~s.heur_ok).astype(jnp.float32) * NEG
        ok_fin = jnp.logical_and(hits, top_mask[None])
        flp = flp + (~ok_fin).astype(jnp.float32) * NEG
        m_seq = jnp.concatenate([s.fin_seq, cand_seq], axis=1)
        m_sc = jnp.concatenate([s.fin_sc, flp], axis=1)
        m_fin = jnp.concatenate([s.is_fin, ok_fin], axis=1)
        new_fin_sc, bidx = jax.lax.top_k(m_sc, K)
        new_fin_seq = _take_beams(m_seq, bidx)
        new_is_fin = jnp.take_along_axis(m_fin, bidx, axis=1)

        # reorder the cache rows by surviving parents and advance one token
        flat_parent = (parent_keep + bk_off).reshape(-1)
        cache2 = qwen2.KVCache(k=jnp.take(s.cache.k, flat_parent, axis=1),
                               v=jnp.take(s.cache.v, flat_parent, axis=1),
                               index=s.cache.index)
        cache2, new_logits = decode_fn(cache2, cur_tok.reshape(-1), t + i)

        if no_repeat_ngram_size > 0:
            H = s.hist.shape[1]
            h3 = _take_beams(s.hist.reshape(b, K, H), parent_keep)
            h3 = jax.lax.dynamic_update_slice(h3, cur_tok[:, :, None], (0, 0, t + i))
            new_hist = h3.reshape(b * K, H)
        else:
            new_hist = s.hist

        # early-stop heuristic ([hf] _check_early_stop_heuristic) at cur_len = i+1
        if early_stopping == "never" and length_penalty > 0.0:
            best_len = float(max_new_tokens)
        else:
            best_len = (i + 1.0)
        best_poss = new_run_sc[:, :1] / (best_len ** length_penalty)
        worst_fin = jnp.where(new_is_fin,
                              jnp.min(new_fin_sc, axis=1, keepdims=True), NEG)
        new_heur = jnp.logical_and(
            s.heur_ok, jnp.any(best_poss > worst_fin, axis=-1, keepdims=True))

        # loop-level termination ([hf] _beam_search_has_unfinished_sequences)
        improvement = jnp.any(new_heur)
        open_beam = (~jnp.all(new_is_fin)) if early_stopping is True \
            else jnp.ones((), bool)
        valid_cont = ~jnp.all(hits)
        new_alive = improvement & open_beam & valid_cont
        return BeamState(i + 1, t, cache2, new_logits, new_run_seq, new_run_sc,
                         new_fin_seq, new_fin_sc, new_is_fin, new_heur,
                         new_alive, new_hist)

    return cond, body


def beam_loop(first_logits, cache, decode_fn, *, batch: int, prompt_len: int,
              num_beams: int, max_new_tokens: int, eos_token_id: int,
              length_penalty: float = 1.0, early_stopping=False,
              min_new_tokens: int = 0, num_return_sequences: int = 1,
              no_repeat_ngram_size: int = 0,
              prompt_tokens: "jnp.ndarray | None" = None,
              do_sample: bool = False, temperature: float = 1.0,
              rng: "jax.Array | None" = None):
    """Model-agnostic beam-search loop (traced inside a jit), run to completion.

    first_logits: [B, V] prefill logits. cache: qwen2.KVCache-shaped pytree with
    the batch-beam axis at position 1, ALREADY expanded to B*num_beams rows.
    Returns (sequences [B, R, max_new_tokens], scores [B, R])."""
    assert num_return_sequences <= num_beams
    state = beam_state_init(
        first_logits, cache, num_beams=num_beams, max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id, prompt_len=prompt_len,
        prompt_tokens=prompt_tokens, no_repeat_ngram_size=no_repeat_ngram_size)
    cond, body = _beam_fns(
        decode_fn, num_beams=num_beams, max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id, length_penalty=length_penalty,
        early_stopping=early_stopping, min_new_tokens=min_new_tokens,
        no_repeat_ngram_size=no_repeat_ngram_size, do_sample=do_sample,
        temperature=temperature,
        loop_rng=rng if rng is not None else jax.random.PRNGKey(0))
    state = jax.lax.while_loop(cond, body, state)
    return (state.fin_seq[:, :num_return_sequences],
            state.fin_sc[:, :num_return_sequences])


def _af3_decode_fn(params, cfg: AF3Config, compute_dtype):
    def decode_fn(cache, tokens, position):
        x = qwen2.embed(params["lm"], tokens[:, None], dtype=compute_dtype)
        pos = jnp.broadcast_to(position, (tokens.shape[0], 1)).astype(jnp.int32)
        h, cache = qwen2.forward(params["lm"], cfg.lm, x, pos, cache=cache)
        return cache, qwen2.unembed(params["lm"], cfg.lm, h[:, 0])
    return decode_fn


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_beams", "max_new_tokens", "eos_token_id", "capacity",
                     "length_penalty", "early_stopping", "compute_dtype",
                     "min_new_tokens", "num_return_sequences",
                     "no_repeat_ngram_size", "do_sample", "temperature"))
def generate_beam(params, cfg: AF3Config, token_ids: jnp.ndarray,
                  mels: jnp.ndarray | None = None, *, num_beams: int,
                  max_new_tokens: int, eos_token_id: int, capacity: int = 0,
                  length_penalty: float = 1.0, early_stopping=False,
                  compute_dtype=jnp.bfloat16, min_new_tokens: int = 0,
                  num_return_sequences: int = 1, no_repeat_ngram_size: int = 0,
                  do_sample: bool = False, temperature: float = 1.0,
                  rng: jax.Array | None = None):
    """AF3-family beam-search decode. Returns (sequences [B, R, max_new_tokens]
    int32 padded with EOS, scores [B, R] fp32), best first — token-exact vs
    [hf] generate(num_beams=K, do_sample=False).

    early_stopping: False (default heuristic), True, or "never" — HF semantics.
    """
    b, t = token_ids.shape
    if capacity == 0:
        capacity = -(-(t + max_new_tokens) // 128) * 128
    cache, logits0 = prefill(params, cfg, token_ids, mels, capacity, compute_dtype)
    # beams ride the batch axis: row b*K + k is beam k of batch item b
    cache = qwen2.KVCache(k=jnp.repeat(cache.k, num_beams, axis=1),
                          v=jnp.repeat(cache.v, num_beams, axis=1),
                          index=cache.index)
    return beam_loop(logits0, cache, _af3_decode_fn(params, cfg, compute_dtype),
                     batch=b, prompt_len=t,
                     num_beams=num_beams, max_new_tokens=max_new_tokens,
                     eos_token_id=eos_token_id, length_penalty=length_penalty,
                     early_stopping=early_stopping, min_new_tokens=min_new_tokens,
                     num_return_sequences=num_return_sequences,
                     no_repeat_ngram_size=no_repeat_ngram_size,
                     prompt_tokens=token_ids,
                     do_sample=do_sample, temperature=temperature, rng=rng)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_beams", "max_new_tokens", "eos_token_id", "capacity",
                     "length_penalty", "early_stopping", "compute_dtype",
                     "min_new_tokens", "num_return_sequences", "media_mode",
                     "no_repeat_ngram_size", "do_sample", "temperature"))
def generate_beam_xattn(params, cfg, token_ids: jnp.ndarray,
                        window_embeds: jnp.ndarray, *, num_beams: int,
                        max_new_tokens: int, eos_token_id: int, capacity: int = 0,
                        length_penalty: float = 1.0, early_stopping=False,
                        compute_dtype=jnp.float32, min_new_tokens: int = 0,
                        num_return_sequences: int = 1, media_mode: str = "last",
                        no_repeat_ngram_size: int = 0, do_sample: bool = False,
                        temperature: float = 1.0, rng: jax.Array | None = None):
    """AF1/AF2 (gated-xattn) beam search: the same HF bookkeeping over the
    flamingo prefill/decode pair. Media features are per-batch-row constants, so
    they expand across beams once and never need the per-step reorder."""
    from audio_flamingo_tpu.models import flamingo

    b, t = token_ids.shape
    if capacity == 0:
        capacity = -(-(t + max_new_tokens) // 128) * 128
    cache, media, logits0 = flamingo.prefill(params, cfg, token_ids, window_embeds,
                                             capacity, compute_dtype,
                                             media_mode=media_mode)
    cache = qwen2.KVCache(k=jnp.repeat(cache.k, num_beams, axis=1),
                          v=jnp.repeat(cache.v, num_beams, axis=1),
                          index=cache.index)
    media_k = jnp.repeat(media, num_beams, axis=0)

    def decode_fn(cache, tokens, position):
        return flamingo.decode_step(params, cfg, cache, media_k, tokens,
                                    position, compute_dtype)

    return beam_loop(logits0, cache, decode_fn, batch=b, prompt_len=t,
                     num_beams=num_beams, max_new_tokens=max_new_tokens,
                     eos_token_id=eos_token_id, length_penalty=length_penalty,
                     early_stopping=early_stopping, min_new_tokens=min_new_tokens,
                     num_return_sequences=num_return_sequences,
                     no_repeat_ngram_size=no_repeat_ngram_size,
                     prompt_tokens=token_ids,
                     do_sample=do_sample, temperature=temperature, rng=rng)


# ---------------------------------------------------------------------------
# Engine beam lane: pausable open/advance pair (runtime/beam_lane.py drives it)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_beams", "max_new_tokens", "eos_token_id",
                     "capacity", "no_repeat_ngram_size", "compute_dtype"))
def beam_open(params, token_ids, mels, prompt_len, *, cfg: AF3Config,
              num_beams: int, max_new_tokens: int, eos_token_id: int,
              capacity: int, no_repeat_ngram_size: int = 0,
              compute_dtype=jnp.bfloat16) -> BeamState:
    """Prefill ONE AF3-family request and build its pausable BeamState.

    token_ids may be right-padded to a shape bucket with `prompt_len` ([] int32)
    the true length — same compile-count contract as engine.prefill_into_slot."""
    cache, logits0 = prefill(params, cfg, token_ids, mels, capacity, compute_dtype,
                             prompt_len=prompt_len)
    cache = qwen2.KVCache(k=jnp.repeat(cache.k, num_beams, axis=1),
                          v=jnp.repeat(cache.v, num_beams, axis=1),
                          index=cache.index)
    return beam_state_init(
        logits0, cache, num_beams=num_beams, max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id, prompt_len=prompt_len,
        prompt_tokens=token_ids, no_repeat_ngram_size=no_repeat_ngram_size)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "num_beams", "max_new_tokens",
                     "eos_token_id", "length_penalty", "early_stopping",
                     "min_new_tokens", "no_repeat_ngram_size", "do_sample",
                     "temperature", "compute_dtype"),
    donate_argnames=("state",))
def beam_advance(params, state: BeamState, rng, *, cfg: AF3Config, chunk: int,
                 num_beams: int, max_new_tokens: int, eos_token_id: int,
                 length_penalty: float = 1.0, early_stopping=False,
                 min_new_tokens: int = 0, no_repeat_ngram_size: int = 0,
                 do_sample: bool = False, temperature: float = 1.0,
                 compute_dtype=jnp.bfloat16) -> BeamState:
    """Advance an AF3-family beam request by up to `chunk` steps (engine lane).

    Chunk boundaries only partition the while_loop's iteration space — every
    step sees bit-identical inputs to the single-shot loop, so the finalized
    (sequences, scores) equal generate_beam exactly (tests/test_beam_lane.py)."""
    cond, body = _beam_fns(
        _af3_decode_fn(params, cfg, compute_dtype), num_beams=num_beams,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        length_penalty=length_penalty, early_stopping=early_stopping,
        min_new_tokens=min_new_tokens,
        no_repeat_ngram_size=no_repeat_ngram_size, do_sample=do_sample,
        temperature=temperature, loop_rng=rng)
    i0 = state.i

    def cond2(s):
        return jnp.logical_and(cond(s), s.i < i0 + chunk)

    return jax.lax.while_loop(cond2, body, state)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_beams", "max_new_tokens", "eos_token_id",
                     "capacity", "no_repeat_ngram_size", "media_mode",
                     "compute_dtype"))
def beam_open_xattn(params, token_ids, window_embeds, prompt_len, *, cfg,
                    num_beams: int, max_new_tokens: int, eos_token_id: int,
                    capacity: int, no_repeat_ngram_size: int = 0,
                    media_mode: str = "last", compute_dtype=jnp.float32):
    """Prefill ONE AF1/AF2 request; returns (BeamState, media_k [B*K, S, d])."""
    from audio_flamingo_tpu.models import flamingo

    cache, media, logits0 = flamingo.prefill(
        params, cfg, token_ids, window_embeds, capacity, compute_dtype,
        media_mode=media_mode, prompt_len=prompt_len)
    cache = qwen2.KVCache(k=jnp.repeat(cache.k, num_beams, axis=1),
                          v=jnp.repeat(cache.v, num_beams, axis=1),
                          index=cache.index)
    media_k = jnp.repeat(media, num_beams, axis=0)
    state = beam_state_init(
        logits0, cache, num_beams=num_beams, max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id, prompt_len=prompt_len,
        prompt_tokens=token_ids, no_repeat_ngram_size=no_repeat_ngram_size)
    return state, media_k


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "num_beams", "max_new_tokens",
                     "eos_token_id", "length_penalty", "early_stopping",
                     "min_new_tokens", "no_repeat_ngram_size", "do_sample",
                     "temperature", "compute_dtype"),
    donate_argnames=("state",))
def beam_advance_xattn(params, state: BeamState, media_k, rng, *, cfg, chunk: int,
                       num_beams: int, max_new_tokens: int, eos_token_id: int,
                       length_penalty: float = 1.0, early_stopping=False,
                       min_new_tokens: int = 0, no_repeat_ngram_size: int = 0,
                       do_sample: bool = False, temperature: float = 1.0,
                       compute_dtype=jnp.float32) -> BeamState:
    """Advance an AF1/AF2 beam request by up to `chunk` steps (engine lane)."""
    from audio_flamingo_tpu.models import flamingo

    def decode_fn(cache, tokens, position):
        return flamingo.decode_step(params, cfg, cache, media_k, tokens,
                                    position, compute_dtype)

    cond, body = _beam_fns(
        decode_fn, num_beams=num_beams, max_new_tokens=max_new_tokens,
        eos_token_id=eos_token_id, length_penalty=length_penalty,
        early_stopping=early_stopping, min_new_tokens=min_new_tokens,
        no_repeat_ngram_size=no_repeat_ngram_size, do_sample=do_sample,
        temperature=temperature, loop_rng=rng)
    i0 = state.i

    def cond2(s):
        return jnp.logical_and(cond(s), s.i < i0 + chunk)

    return jax.lax.while_loop(cond2, body, state)
