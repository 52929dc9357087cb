"""AF1/AF2 model family: CLAP-window audio embeds -> audio-transform self-attention
layers -> Flamingo gated cross-attention into an OPT (AF1) or Qwen2.5 (AF2) decoder.

Composition reference: SURVEY.md §3.2 (AF1 arch: window-level CLAP embeddings passed
through self-attention "audio transformation layers", then gated xattn every N LM layers;
mechanism per [hf] models/idefics/modeling_idefics.py:691-815). The CLAP/HTSAT tower
itself lives in models/clap.py; this module consumes its per-window embeddings, so AF1
(OPT) and AF2 (Qwen2) share everything but the decoder.

TPU-first deltas: xattn layers are explicit scan-stacked params (no nn.Module graph
surgery); media masking is a static boolean mask from per-token media counts; few-shot ICL
interleaving is just that mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF2Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops import gqa_attention, layer_norm, rms_norm, rope_cos_sin
from audio_flamingo_tpu.ops import xattn as xattn_op


# ------------------------------------------------------------------ audio transform layers

def _atl_init(rng, d, num_heads):
    keys = jax.random.split(rng, 6)
    s = d ** -0.5
    return {
        "ln1_w": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "q": {"w": jax.random.normal(keys[0], (d, d)) * s * 0.5},
        "k": {"w": jax.random.normal(keys[1], (d, d)) * s * 0.5},
        "v": {"w": jax.random.normal(keys[2], (d, d)) * s * 0.5},
        "o": {"w": jax.random.normal(keys[3], (d, d)) * s * 0.5},
        "ln2_w": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": {"w": jax.random.normal(keys[4], (d, 4 * d)) * s * 0.5,
                "b": jnp.zeros((4 * d,))},
        "fc2": {"w": jax.random.normal(keys[5], (4 * d, d)) * ((4 * d) ** -0.5) * 0.5,
                "b": jnp.zeros((d,))},
    }


def _atl_forward(x, lp, num_heads):
    from audio_flamingo_tpu.ops.mlp import gelu_mlp

    b, s, d = x.shape
    hd = d // num_heads
    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
    q = jnp.dot(h, lp["q"]["w"].astype(h.dtype)).reshape(b, s, num_heads, hd)
    k = jnp.dot(h, lp["k"]["w"].astype(h.dtype)).reshape(b, s, num_heads, hd)
    v = jnp.dot(h, lp["v"]["w"].astype(h.dtype)).reshape(b, s, num_heads, hd)
    x = x + jnp.dot(gqa_attention(q, k, v).reshape(b, s, d), lp["o"]["w"].astype(x.dtype))
    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
    return x + gelu_mlp(h, {"fc1": lp["fc1"]["w"].astype(x.dtype), "fc1_b": lp["fc1"]["b"],
                            "fc2": lp["fc2"]["w"].astype(x.dtype), "fc2_b": lp["fc2"]["b"]})


# ------------------------------------------------------------------------------- AF2 model

def init_fusion(rng: jax.Array, cfg: AF2Config) -> dict:
    """Audio-transform + gated-xattn stacks only (no LM).

    Lets callers pair the fusion stack with a pre-quantized LM tree
    (`ops.quant.random_quantized_lm` / `quantize_lm_params`) without ever
    materializing the full-precision LM — at serving scale (3B+) the f32 init
    tree alone would not fit alongside the int8 weights in 16 GB HBM."""
    k2, k3 = jax.random.split(rng)
    d_lm = cfg.lm.hidden_size
    d_a = cfg.audio_embed_dim
    n_x = cfg.lm.num_layers // cfg.xattn.cross_every_n_layers
    atl = [_atl_init(k, d_a, 8) for k in jax.random.split(k2, cfg.num_audio_transform_layers)]
    xa = [xattn_op.init(k, d_lm, d_a, cfg.xattn.num_heads, cfg.xattn.ffn_mult)
          for k in jax.random.split(k3, n_x)]
    return {
        "audio_transform": jax.tree.map(lambda *xs: jnp.stack(xs), *atl),
        "xattn": jax.tree.map(lambda *xs: jnp.stack(xs), *xa),
    }


def init(rng: jax.Array, cfg: AF2Config) -> dict:
    """AF2 params: audio transform layers + xattn blocks + Qwen2 LM (CLAP tower separate)."""
    k1, k4 = jax.random.split(rng)
    fusion = init_fusion(k1, cfg)
    if _is_opt(cfg):
        from audio_flamingo_tpu.models import opt as opt_mod

        lm_params = opt_mod.init(k4, cfg.lm)
    else:
        lm_params = qwen2.init(k4, cfg.lm)
    return {**fusion, "lm": lm_params}


def transform_audio(params: dict, cfg: AF2Config, window_embeds: jnp.ndarray) -> jnp.ndarray:
    """[B, n_media, windows_per_media, d_audio] -> [B, n_media*wpm, d_audio].

    Self-attention runs WITHIN each media item (a clip's sliding windows), never across
    items — cross-media leakage would break Flamingo media masking for few-shot ICL.
    """
    b, n_media, wpm, d = window_embeds.shape
    x = window_embeds.reshape(b * n_media, wpm, d)

    def body(h, lp):
        return _atl_forward(h, lp, 8), None

    x, _ = jax.lax.scan(body, x, params["audio_transform"])
    return x.reshape(b, n_media * wpm, d)


def _is_opt(cfg: AF2Config) -> bool:
    from audio_flamingo_tpu.config import OPTConfig

    return isinstance(cfg.lm, OPTConfig)


def _embed(params, cfg: AF2Config, token_ids, dtype=jnp.float32):
    if _is_opt(cfg):
        from audio_flamingo_tpu.models import opt

        return opt.embed(params["lm"], cfg.lm, token_ids, dtype)
    return qwen2.embed(params["lm"], token_ids, dtype)


def _unembed(params, cfg: AF2Config, hidden):
    if _is_opt(cfg):
        from audio_flamingo_tpu.models import opt

        return opt.unembed(params["lm"], cfg.lm, hidden)
    return qwen2.unembed(params["lm"], cfg.lm, hidden)


def _lm_forward_with_xattn(params, cfg: AF2Config, embeds, positions, media, media_mask,
                           cache: qwen2.KVCache | None = None):
    """Decoder stack (Qwen2 for AF2, OPT for AF1) with a gated-xattn block before every
    Nth layer.

    The xattn blocks cannot ride the same scan as the LM layers (different cadence), so
    the stack runs as a Python loop over layer groups: [xattn_i, lm_layer_j..j+N-1].
    Layer params are sliced from the stacked pytree (static indices: unrolled at trace).
    This is the explicit-layer-list equivalent of the reference's nn.Module graph surgery
    (SURVEY.md §7 design stance).
    """
    from audio_flamingo_tpu.models import opt as opt_mod

    lm = params["lm"]
    lcfg = cfg.lm
    b, s, _ = embeds.shape
    is_opt = _is_opt(cfg)
    if is_opt:
        x = embeds + lm["pos_embed"].astype(embeds.dtype)[positions + lcfg.position_offset]
        cos = sin = None
    else:
        x = embeds
        cos, sin = rope_cos_sin(positions, lcfg.resolved_head_dim(), lcfg.rope_theta)

    if cache is not None:
        kv_pos = jnp.arange(cache.capacity)[None, None, None, :]
        mask = kv_pos <= positions[:, None, :, None]
    else:
        mask = positions[:, None, :, None] >= positions[:, None, None, :]

    every = cfg.xattn.cross_every_n_layers
    # fused-w4 trees (ops/quant4.py fuse=True): big packed weights stay layer-
    # stacked and are indexed inside the Pallas kernel's BlockSpec maps; only
    # the small leaves are sliced per layer (qwen2.split_stacked_w4 rationale)
    stacked, scan_layers = (None, lm["layers"]) if is_opt \
        else qwen2.split_stacked_w4(lm["layers"])
    new_k, new_v = [], []
    for i in range(lcfg.num_layers):
        if i % every == 0:
            xp = jax.tree.map(lambda a: a[i // every], params["xattn"])
            x = xattn_op.apply(xp, x, media, cfg.xattn.num_heads, mask=media_mask)
        lp = jax.tree.map(lambda a: a[i], scan_layers)
        cache_kv = (cache.k[i], cache.v[i]) if cache is not None else None
        cache_idx = cache.index if cache is not None else None
        if is_opt:
            x, kv = opt_mod._layer_forward(x, lp, lcfg, mask, cache_kv, cache_idx)
        else:
            x, kv = qwen2._layer_forward(x, lp, lcfg, cos, sin, mask,
                                         cache_kv=cache_kv, cache_index=cache_idx,
                                         stacked=stacked,
                                         layer_idx=jnp.int32(i))
        if cache is not None:
            new_k.append(kv[0])
            new_v.append(kv[1])
    if is_opt:
        from audio_flamingo_tpu.ops import layer_norm as _ln

        if "ln_f_w" in lm:
            x = _ln(x, lm["ln_f_w"], lm["ln_f_b"])
    else:
        x = rms_norm(x, lm["ln_f_w"], lcfg.rms_norm_eps)
    new_cache = None
    if cache is not None:
        new_cache = qwen2.KVCache(jnp.stack(new_k), jnp.stack(new_v), cache.index + s)
    return x, new_cache


@partial(jax.jit, static_argnames=("cfg",))
def logits(params: dict, cfg: AF2Config, token_ids: jnp.ndarray,
           window_embeds: jnp.ndarray) -> jnp.ndarray:
    """Full forward, single-media case: every text token may attend to all audio.

    window_embeds: [B, n_media, windows_per_media, d_audio] CLAP window embeddings. For
    few-shot ICL interleaving use `logits_with_media_mask`.
    """
    media = transform_audio(params, cfg, window_embeds)
    b, t = token_ids.shape
    embeds = _embed(params, cfg, token_ids)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    h, _ = _lm_forward_with_xattn(params, cfg, embeds, pos, media, media_mask=None)
    return _unembed(params, cfg, h)


@partial(jax.jit, static_argnames=("cfg", "capacity", "compute_dtype", "media_mode"))
def prefill(params: dict, cfg: AF2Config, token_ids: jnp.ndarray,
            window_embeds: jnp.ndarray, capacity: int, compute_dtype=jnp.float32,
            text_media_idx: jnp.ndarray | None = None, media_mode: str = "last",
            prompt_len: jnp.ndarray | None = None):
    """Prompt + CLAP windows -> (cache, media, last-token logits).

    window_embeds: [B, n_media, windows_per_media, d_audio]. Media features are computed
    once here and re-used by every decode step (they are static during generation).
    text_media_idx: optional [B, T] media ordinals for Flamingo masking during the
    prompt (AF1 few-shot ICL, SURVEY.md §3.2); decode steps attend per `media_mode`.
    """
    b, t = token_ids.shape
    media = transform_audio(params, cfg, window_embeds.astype(compute_dtype))
    embeds = _embed(params, cfg, token_ids, dtype=compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    if _is_opt(cfg):
        from audio_flamingo_tpu.models import opt as opt_mod

        cache = opt_mod.init_cache(cfg.lm, b, capacity, dtype=compute_dtype)
    else:
        cache = qwen2.init_cache(cfg.lm, b, capacity, dtype=compute_dtype)
    mmask = None
    if text_media_idx is not None:
        n_media = window_embeds.shape[1]
        mmask = xattn_op.media_mask(text_media_idx, n_media, window_embeds.shape[2],
                                    mode=media_mode)
    h, cache = _lm_forward_with_xattn(params, cfg, embeds, pos, media, media_mask=mmask,
                                      cache=cache)
    if prompt_len is None:
        return cache, media, _unembed(params, cfg, h[:, -1])
    last = jnp.take_along_axis(
        h, jnp.full((b, 1, 1), prompt_len - 1, jnp.int32).repeat(h.shape[-1], -1), axis=1)
    cache = cache._replace(index=prompt_len.astype(jnp.int32))
    return cache, media, _unembed(params, cfg, last[:, 0])


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"), donate_argnames=("cache",))
def decode_step(params: dict, cfg: AF2Config, cache, media: jnp.ndarray,
                token: jnp.ndarray, position: jnp.ndarray, compute_dtype=jnp.float32,
                decode_media_mask: jnp.ndarray | None = None):
    """One decode step with gated cross-attention to the (fixed) media features.

    decode_media_mask: optional [B, 1, 1, S] mask restricting which media the generated
    tokens may attend (Flamingo 'last' semantics for few-shot ICL)."""
    embeds = _embed(params, cfg, token[:, None], dtype=compute_dtype)
    pos = jnp.broadcast_to(position[None, None], (token.shape[0], 1)).astype(jnp.int32)
    h, cache = _lm_forward_with_xattn(params, cfg, embeds, pos, media,
                                      media_mask=decode_media_mask, cache=cache)
    return cache, _unembed(params, cfg, h[:, 0])


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "capacity", "sampling",
                                   "eos_token_id", "compute_dtype", "media_mode",
                                   "stop_sequences", "return_logprobs"))
def generate(params: dict, cfg: AF2Config, token_ids: jnp.ndarray,
             window_embeds: jnp.ndarray, *, max_new_tokens: int = 64, capacity: int = 0,
             eos_token_id: int = -1, sampling=None, rng=None, compute_dtype=jnp.float32,
             text_media_idx: jnp.ndarray | None = None, media_mode: str = "last",
             prompt_len: jnp.ndarray | None = None, stop_sequences: tuple = (),
             return_logprobs: bool = False):
    """AF1/AF2 device-side generation (SURVEY.md §3.2 + §3.4).

    With text_media_idx, the prompt uses Flamingo media masking (few-shot ICL) and the
    generated tokens attend per `media_mode` ('last' = only the final clip)."""
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.generate import decode_loop

    b, t = token_ids.shape
    if capacity == 0:
        capacity = -(-(t + max_new_tokens) // 128) * 128
    sampling = sampling or SamplingParams()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cache, media, logits0 = prefill(params, cfg, token_ids, window_embeds, capacity,
                                    compute_dtype, text_media_idx=text_media_idx,
                                    media_mode=media_mode, prompt_len=prompt_len)
    decode_mask = None
    if text_media_idx is not None:
        n_media = window_embeds.shape[1]
        gen_idx = jnp.full((b, 1), n_media, jnp.int32)  # generated tokens: after all media
        decode_mask = xattn_op.media_mask(gen_idx, n_media, window_embeds.shape[2],
                                          mode=media_mode)

    def decode_fn(cache, token, position):
        return decode_step(params, cfg, cache, media, token, position, compute_dtype,
                           decode_media_mask=decode_mask)

    start = t if prompt_len is None else prompt_len
    prompt_history = None
    if sampling.repetition_penalty != 1.0:  # HF: penalty spans prompt + generated
        valid = jnp.arange(t)[None] < (prompt_len if prompt_len is not None else t)
        prompt_history = jnp.where(valid, token_ids, -1)
    if sampling.no_repeat_ngram_size > 0:
        assert prompt_len is None, \
            "no_repeat_ngram_size needs the exact prompt (no shape bucket padding)"
    return decode_loop(logits0, cache, start, decode_fn, max_new_tokens=max_new_tokens,
                       eos_token_id=eos_token_id, sampling=sampling, rng=rng,
                       prompt_history=prompt_history, stop_sequences=stop_sequences,
                       return_logprobs=return_logprobs,
                       prompt_tokens=token_ids
                       if sampling.no_repeat_ngram_size > 0 else None)


def logits_with_media_mask(params: dict, cfg: AF2Config, token_ids: jnp.ndarray,
                           window_embeds: jnp.ndarray, text_media_idx: jnp.ndarray,
                           n_media: int, mode: str = "last") -> jnp.ndarray:
    """Like `logits` but with explicit Flamingo media masking for few-shot ICL.

    window_embeds: [B, n_media, windows_per_media, d_audio].
    """
    media = transform_audio(params, cfg, window_embeds)
    b, t = token_ids.shape
    tokens_per_media = window_embeds.shape[2]
    mmask = xattn_op.media_mask(text_media_idx, n_media, tokens_per_media, mode=mode)
    embeds = _embed(params, cfg, token_ids)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    h, _ = _lm_forward_with_xattn(params, cfg, embeds, pos, media, media_mask=mmask)
    return _unembed(params, cfg, h)
