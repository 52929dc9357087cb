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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops.sampling import apply_no_repeat_ngram
from audio_flamingo_tpu.runtime.generate import prefill

NEG = -1.0e9


def beam_loop(first_logits, cache, decode_fn, *, batch: int, prompt_len: int,
              num_beams: int, max_new_tokens: int, eos_token_id: int,
              length_penalty: float = 1.0, early_stopping=False,
              min_new_tokens: int = 0, num_return_sequences: int = 1,
              no_repeat_ngram_size: int = 0,
              prompt_tokens: "jnp.ndarray | None" = None,
              do_sample: bool = False, temperature: float = 1.0,
              rng: "jax.Array | None" = None):
    """Model-agnostic beam-search loop (traced inside a jit).

    first_logits: [B, V] prefill logits. cache: qwen2.KVCache-shaped pytree with
    the batch-beam axis at position 1, ALREADY expanded to B*num_beams rows.
    decode_fn: (cache, tokens [B*K], position []) -> (cache, logits [B*K, V]).
    Returns (sequences [B, R, max_new_tokens], scores [B, R]) — the HF
    `_beam_search` bookkeeping documented at module top."""
    b = first_logits.shape[0]
    t = prompt_len
    K, K2 = num_beams, 2 * num_beams
    assert num_return_sequences <= K
    vocab = first_logits.shape[-1]
    logits = jnp.repeat(first_logits, K, axis=0)                  # [B*K, V]

    loop_rng = rng if rng is not None else jax.random.PRNGKey(0)
    pad = eos_token_id if eos_token_id >= 0 else 0
    run_seq = jnp.full((b, K, max_new_tokens), pad, jnp.int32)
    run_sc = jnp.zeros((b, K), jnp.float32).at[:, 1:].set(NEG)    # beam 0 only
    fin_seq = run_seq
    fin_sc = jnp.full((b, K), NEG, jnp.float32)
    is_fin = jnp.zeros((b, K), bool)
    heur_ok = jnp.ones((b, 1), bool)
    alive = jnp.ones((), bool)
    top_mask = jnp.arange(K2) < K                                 # 2K-candidate rule
    bk_off = (jnp.arange(b) * K)[:, None]

    def take_beams(x, idx):
        """Gather beams along axis 1 ([hf] _gather_beams)."""
        full_idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, full_idx, axis=1)

    def cond(c):
        i = c[0]
        return jnp.logical_and(i < max_new_tokens, c[-1])

    if no_repeat_ngram_size > 0:
        assert prompt_tokens is not None, \
            "no_repeat_ngram_size needs prompt_tokens"
        prompt_bk = jnp.repeat(prompt_tokens, K, axis=0)         # [B*K, t]

    def body(c):
        i, cache, logits, run_seq, run_sc, fin_seq, fin_sc, is_fin, heur_ok, _ = c
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if no_repeat_ngram_size > 0:
            # [hf] _beam_search applies the processor on the log-probs of each
            # RUNNING beam before candidate selection (prompt + generated history)
            buf = jnp.concatenate(
                [prompt_bk, run_seq.reshape(b * K, max_new_tokens)], axis=1)
            lp = apply_no_repeat_ngram(lp, buf, t + i, no_repeat_ngram_size)
        if min_new_tokens > 0 and eos_token_id >= 0:
            col = lp[:, eos_token_id]
            lp = lp.at[:, eos_token_id].set(jnp.where(i < min_new_tokens, NEG, col))
        if do_sample and temperature != 1.0:
            lp = lp / max(temperature, 1e-6)   # [hf] warpers run on the log-probs
        lp = lp.reshape(b, K, vocab)
        acc = (lp + run_sc[:, :, None]).reshape(b, K * vocab)

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
        cand_seq = take_beams(run_seq, parent).at[:, :, i].set(tok)
        # stopping criteria: EOS or max length reached with this token
        hits = jnp.logical_or(tok == eos_token_id, i + 1 >= max_new_tokens)

        # next running beams: best K that did NOT finish ([hf] :3036)
        sc_running = cand_sc + hits.astype(jnp.float32) * NEG
        new_run_sc, keep = jax.lax.top_k(sc_running, K)
        new_run_seq = take_beams(cand_seq, keep)
        parent_keep = jnp.take_along_axis(parent, keep, axis=1)   # [B, K]
        cur_tok = jnp.take_along_axis(tok, keep, axis=1)

        # finished update ([hf] _update_finished_beams): length penalty over the
        # GENERATED length, only top-K-rank candidates may finalize, merge+topk
        flp = cand_sc / ((i + 1.0) ** length_penalty)
        if early_stopping is True:
            full_mask = jnp.all(is_fin, axis=1, keepdims=True)
            flp = flp + full_mask.astype(jnp.float32) * NEG
        flp = flp + (~heur_ok).astype(jnp.float32) * NEG
        ok_fin = jnp.logical_and(hits, top_mask[None])
        flp = flp + (~ok_fin).astype(jnp.float32) * NEG
        m_seq = jnp.concatenate([fin_seq, cand_seq], axis=1)
        m_sc = jnp.concatenate([fin_sc, flp], axis=1)
        m_fin = jnp.concatenate([is_fin, ok_fin], axis=1)
        new_fin_sc, bidx = jax.lax.top_k(m_sc, K)
        new_fin_seq = take_beams(m_seq, bidx)
        new_is_fin = jnp.take_along_axis(m_fin, bidx, axis=1)

        # reorder the cache rows by surviving parents and advance one token
        flat_parent = (parent_keep + bk_off).reshape(-1)
        cache2 = qwen2.KVCache(k=jnp.take(cache.k, flat_parent, axis=1),
                               v=jnp.take(cache.v, flat_parent, axis=1),
                               index=cache.index)
        cache2, new_logits = decode_fn(cache2, cur_tok.reshape(-1), t + i)

        # early-stop heuristic ([hf] _check_early_stop_heuristic) at cur_len = i+1
        if early_stopping == "never" and length_penalty > 0.0:
            best_len = float(max_new_tokens)
        else:
            best_len = (i + 1.0)
        best_poss = new_run_sc[:, :1] / (best_len ** length_penalty)
        worst_fin = jnp.where(new_is_fin,
                              jnp.min(new_fin_sc, axis=1, keepdims=True), NEG)
        new_heur = jnp.logical_and(
            heur_ok, jnp.any(best_poss > worst_fin, axis=-1, keepdims=True))

        # loop-level termination ([hf] _beam_search_has_unfinished_sequences)
        improvement = jnp.any(new_heur)
        open_beam = (~jnp.all(new_is_fin)) if early_stopping is True \
            else jnp.ones((), bool)
        valid_cont = ~jnp.all(hits)
        new_alive = improvement & open_beam & valid_cont
        return (i + 1, cache2, new_logits, new_run_seq, new_run_sc,
                new_fin_seq, new_fin_sc, new_is_fin, new_heur, new_alive)

    carry = (jnp.zeros((), jnp.int32), cache, logits, run_seq, run_sc,
             fin_seq, fin_sc, is_fin, heur_ok, alive)
    _, _, _, _, _, fin_seq, fin_sc, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return (fin_seq[:, :num_return_sequences],
            fin_sc[:, :num_return_sequences])


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

    def decode_fn(cache, tokens, position):
        x = qwen2.embed(params["lm"], tokens[:, None], dtype=compute_dtype)
        pos = jnp.broadcast_to(position, (tokens.shape[0], 1)).astype(jnp.int32)
        h, cache = qwen2.forward(params["lm"], cfg.lm, x, pos, cache=cache)
        return cache, qwen2.unembed(params["lm"], cfg.lm, h[:, 0])

    return beam_loop(logits0, cache, decode_fn, batch=b, prompt_len=t,
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
                     "no_repeat_ngram_size"))
def generate_beam_xattn(params, cfg, token_ids: jnp.ndarray,
                        window_embeds: jnp.ndarray, *, num_beams: int,
                        max_new_tokens: int, eos_token_id: int, capacity: int = 0,
                        length_penalty: float = 1.0, early_stopping=False,
                        compute_dtype=jnp.float32, min_new_tokens: int = 0,
                        num_return_sequences: int = 1, media_mode: str = "last",
                        no_repeat_ngram_size: int = 0):
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
                     prompt_tokens=token_ids)
