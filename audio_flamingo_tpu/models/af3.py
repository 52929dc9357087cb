"""AF3 / Music Flamingo model: AF-Whisper tower -> MLP adaptor -> Qwen2.5 LM with
LLaVA-style prefix tokens.

Wiring reference (golden target): [hf] models/qwen2_audio/modeling_qwen2_audio.py:777-849 —
audio embeds are scattered over `<sound>` placeholder positions in the input embedding
sequence (masked_scatter at :834-837, token-count validation :827-833). The processor
(runtime/processor.py) expands a single placeholder into out_len copies BEFORE tokenization
([hf] models/qwen2_audio/processing_qwen2_audio.py:117-166), so prefill sees final length.

TPU-first deltas: the scatter is a static-shape cumsum-gather (no boolean masked_scatter);
encoder windows are an independent batch axis, shardable across the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import adaptor, qwen2, whisper_encoder


def init(rng: jax.Array, cfg: AF3Config) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "encoder": whisper_encoder.init(k1, cfg.encoder),
        "adaptor": adaptor.init(k2, cfg.encoder.d_model, cfg.lm.hidden_size),
        "lm": qwen2.init(k3, cfg.lm),
    }


def tokens_per_window(cfg: AF3Config) -> int:
    return cfg.encoder.max_source_positions // cfg.encoder.pool_stride


def encode_audio(params: dict, cfg: AF3Config, mels: jnp.ndarray,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """[num_windows, 3000, n_mels] -> [num_windows, tokens_per_window, lm_hidden].

    Each 30 s window encodes independently (window-parallel across batch/mesh), then is
    pooled (AvgPool stride 2) and projected into LM embedding space.
    """
    h = whisper_encoder.apply(params["encoder"], cfg.encoder, mels, compute_dtype=compute_dtype)
    return adaptor.apply(params["adaptor"], h)


def scatter_audio_embeds(text_embeds: jnp.ndarray, token_ids: jnp.ndarray,
                         audio_embeds: jnp.ndarray, audio_token_id: int) -> jnp.ndarray:
    """Replace embeddings at placeholder positions with audio embeddings, in order.

    text_embeds: [B, T, D]; token_ids: [B, T]; audio_embeds: [B, A, D] (flattened window
    tokens per row; A >= number of placeholders in that row).
    Equivalent to [hf] masked_scatter (modeling_qwen2_audio.py:834-837) but static-shape:
    the j-th placeholder position (scan order) takes audio_embeds[:, j].
    """
    is_audio = token_ids == audio_token_id                        # [B, T]
    # ordinal of each placeholder within its row
    ordinal = jnp.cumsum(is_audio.astype(jnp.int32), axis=1) - 1  # [B, T]
    ordinal = jnp.clip(ordinal, 0, audio_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(audio_embeds, ordinal[..., None], axis=1)  # [B, T, D]
    return jnp.where(is_audio[..., None], gathered.astype(text_embeds.dtype), text_embeds)


def build_input_embeds(params: dict, cfg: AF3Config, token_ids: jnp.ndarray,
                       mels: jnp.ndarray | None, compute_dtype=jnp.float32) -> jnp.ndarray:
    """token ids (+ optional mels [B, num_windows, 3000, n_mels]) -> LM input embeddings."""
    embeds = qwen2.embed(params["lm"], token_ids, dtype=compute_dtype)
    if mels is None:
        return embeds
    b, nw, frames, nmel = mels.shape
    audio = encode_audio(params, cfg, mels.reshape(b * nw, frames, nmel), compute_dtype)
    audio = audio.reshape(b, nw * audio.shape[1], -1)
    return scatter_audio_embeds(embeds, token_ids, audio, cfg.audio_token_id)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def logits(params: dict, cfg: AF3Config, token_ids: jnp.ndarray,
           mels: jnp.ndarray | None = None, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Full-sequence forward (training/eval path): [B, T] (+mels) -> [B, T, vocab] fp32."""
    b, t = token_ids.shape
    x = build_input_embeds(params, cfg, token_ids, mels, compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    h, _ = qwen2.forward(params["lm"], cfg.lm, x, pos)
    return qwen2.unembed(params["lm"], cfg.lm, h)


def _shifted_ce_terms(lg: jnp.ndarray, labels: jnp.ndarray):
    """Unnormalized shifted-CE terms: (nll_sum, valid_token_count).

    Split out so gradient accumulation can normalize by the GLOBAL valid count across
    microbatches (train/train_step.py) — making accumulated grads bit-identical to the
    full-batch loss instead of an average-of-averages approximation."""
    shift_logits = lg[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels >= 0
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum(), valid.sum()


def _shifted_ce(lg: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted CE over label positions >= 0 (prompt/audio positions are -100-masked),
    matching [hf] modeling_qwen2_audio.py:853-866 semantics."""
    nll_sum, count = _shifted_ce_terms(lg, labels)
    return nll_sum / jnp.maximum(count, 1)


def loss_terms(params: dict, cfg: AF3Config, token_ids: jnp.ndarray, labels: jnp.ndarray,
               mels: jnp.ndarray | None = None, compute_dtype=jnp.float32,
               ce_chunk: int = 0):
    """Unnormalized (nll_sum, valid_count) for gradient accumulation (see _shifted_ce_terms).

    ce_chunk > 0: memory-efficient cross-entropy — the [B, T, 152k] f32 logits
    tensor costs gigabytes at training shapes (e.g. 2 GB at B4 x T814), so the
    unembed + log-softmax run per `ce_chunk`-token slice inside a remat'd scan:
    peak CE memory is [B, ce_chunk, V] and the backward recomputes each chunk's
    logits (one extra unembed matmul per chunk — cheap next to the saved HBM).
    """
    if ce_chunk <= 0:
        return _shifted_ce_terms(logits(params, cfg, token_ids, mels, compute_dtype),
                                 labels)
    b, t = token_ids.shape
    x = build_input_embeds(params, cfg, token_ids, mels, compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    h, _ = qwen2.forward(params["lm"], cfg.lm, x, pos)
    return _chunked_ce_terms(params, cfg, h, labels, ce_chunk)


def _chunked_ce_terms(params: dict, cfg: AF3Config, h: jnp.ndarray,
                      labels: jnp.ndarray, ce_chunk: int):
    """Shifted-CE terms from HIDDEN states, unembedding ce_chunk tokens at a time."""
    from audio_flamingo_tpu.ops.remat import remat_wrap

    b, t, d = h.shape
    hs = h[:, :-1]
    ls = labels[:, 1:]
    n = t - 1
    pad = (-n) % ce_chunk
    if pad:
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        ls = jnp.pad(ls, ((0, 0), (0, pad)), constant_values=-100)
    nchunks = (n + pad) // ce_chunk
    hs = hs.reshape(b, nchunks, ce_chunk, d).transpose(1, 0, 2, 3)
    ls = ls.reshape(b, nchunks, ce_chunk).transpose(1, 0, 2)

    def body(carry, xs):
        s, c = carry
        hc, lc = xs
        lg = qwen2.unembed(params["lm"], cfg.lm, hc)
        valid = lc >= 0
        safe = jnp.where(valid, lc, 0)
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        return (s + nll.sum(), c + valid.sum()), None

    (s, c), _ = jax.lax.scan(
        remat_wrap(body, "full"),
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (hs, ls))
    return s, c


def loss(params: dict, cfg: AF3Config, token_ids: jnp.ndarray, labels: jnp.ndarray,
         mels: jnp.ndarray | None = None, compute_dtype=jnp.float32,
         ce_chunk: int = 0):
    """Dense training loss (see _shifted_ce for semantics; ce_chunk: loss_terms)."""
    s, c = loss_terms(params, cfg, token_ids, labels, mels, compute_dtype,
                      ce_chunk=ce_chunk)
    return s / jnp.maximum(c, 1)


def loss_sp(params: dict, cfg: AF3Config, token_ids: jnp.ndarray, labels: jnp.ndarray,
            mels: jnp.ndarray | None = None, *, mesh, axis: str = "model",
            attn_impl: str = "ring", compute_dtype=jnp.float32):
    """Sequence-parallel training loss for context-extension stages (AF3 stage 3.5 /
    Music Flamingo full-song training, SURVEY.md §2.9 SP row): the LM runs with the
    token axis sharded over `axis` (ring or Ulysses attention inside, see
    qwen2.forward_sp), so activation memory per device is O(T/sp).

    Numerically identical to `loss` (gradient-parity tested on the fake 8-CPU mesh).
    The audio encoder runs window-parallel as usual (windows are a batch axis); embed,
    scatter, unembed and the CE are token-local, so XLA keeps them sequence-sharded.
    Requires T % sp == 0 (pad the token bucket; -100 labels mask the pads).
    """
    lg = _sp_logits(params, cfg, token_ids, mels, mesh=mesh, axis=axis,
                    attn_impl=attn_impl, compute_dtype=compute_dtype)
    return _shifted_ce(lg, labels)


def loss_sp_terms(params: dict, cfg: AF3Config, token_ids: jnp.ndarray,
                  labels: jnp.ndarray, mels: jnp.ndarray | None = None, *, mesh,
                  axis: str = "model", attn_impl: str = "ring", compute_dtype=jnp.float32):
    """Unnormalized (nll_sum, valid_count) under sequence parallelism — the SP analogue
    of loss_terms, so gradient accumulation composes with context-extension training."""
    lg = _sp_logits(params, cfg, token_ids, mels, mesh=mesh, axis=axis,
                    attn_impl=attn_impl, compute_dtype=compute_dtype)
    return _shifted_ce_terms(lg, labels)


def _sp_logits(params: dict, cfg: AF3Config, token_ids: jnp.ndarray,
               mels: jnp.ndarray | None, *, mesh, axis: str, attn_impl: str,
               compute_dtype) -> jnp.ndarray:
    b, t = token_ids.shape
    sp = mesh.shape[axis]
    assert t % sp == 0, (t, sp)
    x = build_input_embeds(params, cfg, token_ids, mels, compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    h = qwen2.forward_sp(params["lm"], cfg.lm, x, pos, mesh, axis=axis,
                         attn_impl=attn_impl)
    return qwen2.unembed(params["lm"], cfg.lm, h)
