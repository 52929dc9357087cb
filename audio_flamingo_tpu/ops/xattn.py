"""Flamingo-style gated cross-attention block (AF1/AF2 fusion).

Mechanism reference: [hf] models/idefics/modeling_idefics.py:691-815 — a cross-attention
block inserted before LM layers whose residuals are scaled by tanh(alpha) with ZERO-INIT
alphas (:858-859), so insertion is an identity map at init; separate gate for the
following dense block. Media masking (which text attends to which audio) follows Flamingo
semantics: each text token attends to the most recent preceding media item ("last") or to
all preceding items ("all_previous").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops.attention import gqa_attention
from audio_flamingo_tpu.ops.norms import layer_norm
from audio_flamingo_tpu.ops.mlp import gelu_mlp


def init(rng: jax.Array, d_model: int, d_media: int, num_heads: int,
         ffn_mult: int = 4) -> dict:
    keys = jax.random.split(rng, 6)
    s, sm = d_model ** -0.5, d_media ** -0.5
    f = ffn_mult * d_model
    return {
        "ln_q_w": jnp.ones((d_model,)), "ln_q_b": jnp.zeros((d_model,)),
        "ln_kv_w": jnp.ones((d_media,)), "ln_kv_b": jnp.zeros((d_media,)),
        "q": {"w": jax.random.normal(keys[0], (d_model, d_model)) * s * 0.5},
        "k": {"w": jax.random.normal(keys[1], (d_media, d_model)) * sm * 0.5},
        "v": {"w": jax.random.normal(keys[2], (d_media, d_model)) * sm * 0.5},
        "o": {"w": jax.random.normal(keys[3], (d_model, d_model)) * s * 0.5},
        "ln_ffn_w": jnp.ones((d_model,)), "ln_ffn_b": jnp.zeros((d_model,)),
        "fc1": {"w": jax.random.normal(keys[4], (d_model, f)) * s * 0.5,
                "b": jnp.zeros((f,))},
        "fc2": {"w": jax.random.normal(keys[5], (f, d_model)) * (f ** -0.5) * 0.5,
                "b": jnp.zeros((d_model,))},
        # zero-init gates: the block is an identity at init
        "alpha_xattn": jnp.zeros(()),
        "alpha_dense": jnp.zeros(()),
    }


def media_mask(text_media_idx: jnp.ndarray, n_media: int, tokens_per_media: int,
               mode: str = "last") -> jnp.ndarray:
    """Boolean [B, 1, T, n_media*tokens_per_media] cross-attention mask.

    text_media_idx: [B, T] int32 — for each text position, the number of media items seen
    so far (0 = none yet; i = positions after media i-1). mode 'last': attend only to the
    most recent preceding media; 'all_previous': attend to every preceding media.
    """
    media_ids = jnp.arange(n_media * tokens_per_media) // tokens_per_media  # [S]
    seen = text_media_idx[:, :, None]                  # [B, T, 1]
    if mode == "last":
        allowed = media_ids[None, None, :] == (seen - 1)
    elif mode == "all_previous":
        allowed = media_ids[None, None, :] < seen
    else:
        raise ValueError(mode)
    return allowed[:, None, :, :]


def apply(params: dict, x: jnp.ndarray, media: jnp.ndarray, num_heads: int,
          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [B, T, D] text hidden; media: [B, S, Dm] audio embeds -> [B, T, D]."""
    b, t, d = x.shape
    hd = d // num_heads

    h = layer_norm(x, params["ln_q_w"], params["ln_q_b"])
    m = layer_norm(media, params["ln_kv_w"], params["ln_kv_b"])
    q = jnp.dot(h, params["q"]["w"].astype(h.dtype)).reshape(b, t, num_heads, hd)
    k = jnp.dot(m, params["k"]["w"].astype(m.dtype)).reshape(b, -1, num_heads, hd)
    v = jnp.dot(m, params["v"]["w"].astype(m.dtype)).reshape(b, -1, num_heads, hd)
    attn = gqa_attention(q, k, v, mask=mask).reshape(b, t, d)
    # rows with NO attendable media (mask all-False) produce a uniform average over
    # masked (NEG_INF) scores -> softmax over garbage; zero them explicitly.
    if mask is not None:
        any_media = jnp.any(mask, axis=-1)                    # [B, 1|H, T]
        any_media = jnp.any(any_media, axis=1)[..., None]     # [B, T, 1]
        attn = jnp.where(any_media, attn, 0.0)
    attn = jnp.dot(attn, params["o"]["w"].astype(attn.dtype))
    x = x + jnp.tanh(params["alpha_xattn"]).astype(x.dtype) * attn

    h = layer_norm(x, params["ln_ffn_w"], params["ln_ffn_b"])
    ffn = gelu_mlp(h, {"fc1": params["fc1"]["w"].astype(h.dtype), "fc1_b": params["fc1"]["b"],
                       "fc2": params["fc2"]["w"].astype(h.dtype), "fc2_b": params["fc2"]["b"]})
    return x + jnp.tanh(params["alpha_dense"]).astype(x.dtype) * ffn
