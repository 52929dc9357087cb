"""Logit processors + token sampling, TPU-native.

Semantics reference: [hf] generation/utils.py:1090 (processor pipeline order:
repetition penalty -> temperature -> top-k -> top-p) and :2790-2870 (decode loop:
fp32 logits, softmax+multinomial or argmax). All ops are static-shape and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingParams(NamedTuple):
    temperature: float = 1.0
    top_k: int = 0                  # 0 = off
    top_p: float = 1.0              # 1.0 = off
    greedy: bool = True
    repetition_penalty: float = 1.0  # 1.0 = off; spans prompt+generated (HF input_ids)
    min_new_tokens: int = 0          # EOS is -inf-masked for the first N generated
    #                                  tokens ([hf] MinNewTokensLengthLogitsProcessor)
    no_repeat_ngram_size: int = 0    # 0 = off; bans tokens completing a seen n-gram
    #                                  over prompt+generated ([hf]
    #                                  NoRepeatNGramLogitsProcessor, fairseq rule)


def mask_eos(logits: jnp.ndarray, eos_token_id: int,
             blocked: jnp.ndarray) -> jnp.ndarray:
    """Set the EOS logit to -inf where `blocked` ([B] bool) — the min-new-tokens
    processor ([hf] generation/logits_process.py MinNewTokensLengthLogitsProcessor:
    eos scores -> -inf while generated < min_new_tokens)."""
    if eos_token_id < 0:
        return logits
    col = logits[:, eos_token_id]
    return logits.at[:, eos_token_id].set(jnp.where(blocked, NEG_INF, col))


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits per row; others -> -inf. Static k."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering, HF semantics: keep the smallest prefix of descending-prob tokens
    with cumulative prob > p (the first token crossing p is kept)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # number of kept tokens = index of first cum > p, +1
    keep_sorted = cum - probs < p            # True for tokens before crossing
    kth = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # >= 1
    thresh = jnp.take_along_axis(sorted_logits, kth - 1, axis=-1)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_no_repeat_ngram_rows(logits: jnp.ndarray, history: jnp.ndarray,
                               lengths: jnp.ndarray, n: int,
                               enable: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-row-length n-gram ban: the serving-engine variant of apply_no_repeat_ngram.

    history: [B, H] contiguous prompt+generated buffer; lengths: [B] int32 valid
    counts PER ROW (engines: rows sit at different positions). enable: optional [B]
    bool — rows with enable=False pass through unchanged (per-request opt-in).
    """
    if n <= 0:
        return logits
    b, h = history.shape
    v = logits.shape[-1]
    if h < n:   # can never contain a full n-gram
        return logits
    lengths = jnp.broadcast_to(lengths, (b,)).astype(jnp.int32)
    # current (n-1)-token prefix per row, gathered at that row's own offset
    pidx = jnp.clip(lengths[:, None] - (n - 1) + jnp.arange(n - 1)[None], 0, h - 1)
    prefix = jnp.take_along_axis(history, pidx, axis=1)                 # [B, n-1]
    w = h - (n - 1)
    idx = jnp.arange(w)[:, None] + jnp.arange(n - 1)[None]              # [W, n-1]
    wins = history[:, idx]                                              # [B, W, n-1]
    nxt = history[:, n - 1:]                                            # [B, W]
    # window j is a realized n-gram iff its successor lies in the valid region
    valid = (jnp.arange(w)[None] + n) <= lengths[:, None]
    match = jnp.logical_and(jnp.all(wins == prefix[:, None, :], axis=-1), valid)
    tok = jnp.where(match, nxt, v)          # out-of-range -> dropped by the pad col
    banned = jnp.zeros((b, v + 1), bool).at[
        jnp.arange(b)[:, None], tok].set(True)[:, :v]
    out = jnp.where(banned, NEG_INF, logits)
    active = lengths >= n                    # no full n-gram yet -> no-op
    if enable is not None:
        active = jnp.logical_and(active, enable)
    return jnp.where(active[:, None], out, logits)


def apply_no_repeat_ngram(logits: jnp.ndarray, history: jnp.ndarray,
                          length: jnp.ndarray, n: int) -> jnp.ndarray:
    """Ban tokens that would complete an n-gram already present in `history`
    ([hf] generation/logits_process.py:969 NoRepeatNGramLogitsProcessor — the
    fairseq rule; the prompt counts).

    history: [B, H] CONTIGUOUS token buffer (prompt + generated so far); only
    positions < `length` ([] int32, shared by all rows) are valid.
    """
    return apply_no_repeat_ngram_rows(logits, history, length, n)


def apply_repetition_penalty_rows(logits: jnp.ndarray, token_history: jnp.ndarray,
                                  penalty: jnp.ndarray) -> jnp.ndarray:
    """Per-row HF repetition penalty ([B] f32 penalties; 1.0 = off).

    token_history: [B, H] int32 with -1 for empty slots. Seen-token mask built by
    scatter (O(B*H) writes) — NOT a [B, H, V] one-hot, which would materialize
    gigabytes at serving history lengths x a 152k vocab.
    """
    b, h = token_history.shape
    v = logits.shape[-1]
    tok = jnp.where((token_history < 0) | (token_history >= v), v, token_history)
    seen = jnp.zeros((b, v + 1), bool).at[
        jnp.arange(b)[:, None], tok].set(True)[:, :v]
    pen = jnp.broadcast_to(penalty, (b,)).astype(logits.dtype)[:, None]
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen & (pen != 1.0), penalized, logits)


def apply_repetition_penalty(logits: jnp.ndarray, token_history: jnp.ndarray,
                             penalty: float, vocab_size: int) -> jnp.ndarray:
    """HF repetition penalty: seen tokens' logits are divided (if >0) or multiplied (if <0).

    token_history: [B, H] int32 with -1 for empty slots.
    """
    if penalty == 1.0:
        return logits
    return apply_repetition_penalty_rows(
        logits, token_history, jnp.full((logits.shape[0],), penalty, logits.dtype))


class RowSampling(NamedTuple):
    """Per-row sampling parameters (TRACED arrays, one compiled program for any mix
    of greedy/temperature/top-k/top-p/repetition-penalty across a batch — the
    serving engines' per-request sampling). Build with `row_sampling`."""

    temperature: jnp.ndarray         # [B] f32
    top_k: jnp.ndarray               # [B] i32, 0 = off
    top_p: jnp.ndarray               # [B] f32, 1.0 = off
    greedy: jnp.ndarray              # [B] bool
    repetition_penalty: jnp.ndarray  # [B] f32, 1.0 = off
    ngram_n: jnp.ndarray             # [B] i32, 0 = off


def row_sampling(params_per_row: "list[SamplingParams]") -> RowSampling:
    import numpy as np

    return RowSampling(
        jnp.asarray(np.array([p.temperature for p in params_per_row], np.float32)),
        jnp.asarray(np.array([p.top_k for p in params_per_row], np.int32)),
        jnp.asarray(np.array([p.top_p for p in params_per_row], np.float32)),
        jnp.asarray(np.array([p.greedy for p in params_per_row], bool)),
        jnp.asarray(np.array([p.repetition_penalty for p in params_per_row],
                             np.float32)),
        jnp.asarray(np.array([p.no_repeat_ngram_size for p in params_per_row],
                             np.int32)))


def apply_row_processors(logits: jnp.ndarray, history: jnp.ndarray,
                         lengths: jnp.ndarray, rows: RowSampling, *,
                         use_penalty: bool, ngram_ns: tuple) -> jnp.ndarray:
    """Engine-side history processors over a device-resident per-row history buffer.

    history: [B, H] prompt+generated ids (-1 = empty); lengths: [B] valid counts.
    use_penalty / ngram_ns are STATIC (compiled out when off): ngram_ns is the
    sorted tuple of distinct nonzero n among active rows; each n bans only the
    rows that requested it (rows.ngram_n == n). Order matches the single-request
    decode loop (ban sets -inf; the penalty rescales — commutes for sampling).
    """
    if use_penalty:
        logits = apply_repetition_penalty_rows(
            logits, jnp.where(jnp.arange(history.shape[1])[None] < lengths[:, None],
                              history, -1),
            rows.repetition_penalty)
    for n in ngram_ns:
        logits = apply_no_repeat_ngram_rows(logits, history, lengths, n,
                                            enable=rows.ngram_n == n)
    return logits


def apply_top_k_rows(logits: jnp.ndarray, ks: jnp.ndarray) -> jnp.ndarray:
    """Per-row top-k ([B] int32 k values; 0/negative = off)."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    k_eff = jnp.clip(jnp.where(ks <= 0, v, ks), 1, v)
    thresh = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_top_p_rows(logits: jnp.ndarray, ps: jnp.ndarray) -> jnp.ndarray:
    """Per-row nucleus filtering ([B] f32 p values; 1.0 = off), HF keep-the-
    crossing-token semantics as apply_top_p."""
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < ps[:, None]
    kth = jnp.maximum(jnp.sum(keep_sorted, axis=-1, keepdims=True), 1)
    thresh = jnp.take_along_axis(sorted_desc, kth - 1, axis=-1)
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample_token_rows(rng: jax.Array, logits: jnp.ndarray,
                      rows: RowSampling) -> jnp.ndarray:
    """[B, vocab] fp32 logits -> [B] int32, each row under its own parameters.

    Greedy rows are exact argmax (independent of the rng); sampled rows follow the
    same processor order as sample_token (temperature -> top-k -> top-p)."""
    lg = logits / jnp.maximum(rows.temperature, 1e-6)[:, None]
    lg = apply_top_k_rows(lg, rows.top_k)
    lg = apply_top_p_rows(lg, rows.top_p)
    sampled = jax.random.categorical(rng, lg, axis=-1)
    return jnp.where(rows.greedy, jnp.argmax(logits, axis=-1),
                     sampled).astype(jnp.int32)


def sample_token(rng: jax.Array, logits: jnp.ndarray, params: SamplingParams,
                 token_history: jnp.ndarray | None = None) -> jnp.ndarray:
    """[B, vocab] fp32 logits -> [B] int32 token ids.

    token_history: optional [B, H] context ids (-1 = empty) for the repetition penalty.
    HF's RepetitionPenaltyLogitsProcessor runs over the full input_ids — prompt AND
    generated ([hf] generation/utils.py:1090 pipeline) — so callers must include both.
    Pipeline order matches HF: penalty -> temperature -> top-k -> top-p.
    """
    if token_history is not None and params.repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, token_history,
                                          params.repetition_penalty, logits.shape[-1])
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits / jnp.maximum(params.temperature, 1e-6)
    lg = apply_top_k(lg, params.top_k)
    lg = apply_top_p(lg, params.top_p)
    return jax.random.categorical(rng, lg, axis=-1).astype(jnp.int32)


def engine_row_step(rng_key, logits: jnp.ndarray, hist: jnp.ndarray,
                    hist_len: jnp.ndarray, rows: RowSampling, done: jnp.ndarray,
                    min_left: jnp.ndarray, step_i, *, eos_token_id: int,
                    mixed_sampling: bool, want_logprobs: bool, use_min_new: bool,
                    use_penalty: bool, ngram_ns: tuple):
    """ONE shared per-step pipeline for every serving engine's decode-chunk body:
    n-gram ban -> min-new-tokens EOS mask -> (sampling-only) repetition penalty ->
    sample -> reported logprob -> history append.

    The processor/logprob split matches runtime.generate.decode_loop exactly: the
    ban and the EOS mask shape the REPORTED distribution; the penalty warps only
    the sampling distribution ([hf] output_scores semantics). Returns
    (next_token [B], logprob [B] | None, hist) — extracted so the four engine
    families (slot, paged, xattn-slot, xattn-paged) cannot drift.
    """
    b = logits.shape[0]
    if ngram_ns:
        logits = apply_row_processors(logits, hist, hist_len, rows,
                                      use_penalty=False, ngram_ns=ngram_ns)
    if use_min_new:
        logits = mask_eos(logits, eos_token_id, min_left > step_i)
    s_logits = logits
    if use_penalty:
        s_logits = apply_row_processors(logits, hist, hist_len, rows,
                                        use_penalty=True, ngram_ns=())
    # STATIC fast path: all-greedy batches skip the full-vocab warper sorts
    nxt = sample_token_rows(rng_key, s_logits, rows) if mixed_sampling \
        else jnp.argmax(s_logits, axis=-1).astype(jnp.int32)
    nxt = jnp.where(done, eos_token_id, nxt)
    lp_val = None
    if want_logprobs:
        logp = jax.nn.log_softmax(logits, axis=-1)
        lp_val = jnp.where(done, 0.0,
                           jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0])
    if use_penalty or ngram_ns:
        # append for live rows; done rows aim out of bounds (mode="drop" skips)
        pos = jnp.where(done, hist.shape[1], hist_len)
        hist = hist.at[jnp.arange(b), pos].set(nxt, mode="drop")
    return nxt, lp_val, hist


def processor_flags(active_sampling_params) -> tuple:
    """(use_penalty, ngram_ns) static flags from the active rows' SamplingParams —
    shared by every engine's step() so the flag logic cannot drift."""
    ps = list(active_sampling_params)
    use_pen = any(p.repetition_penalty != 1.0 for p in ps)
    ngram_ns = tuple(sorted({p.no_repeat_ngram_size for p in ps
                             if p.no_repeat_ngram_size > 0}))
    return use_pen, ngram_ns
