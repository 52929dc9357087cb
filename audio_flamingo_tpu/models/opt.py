"""OPT decoder-only LM (AF1's OPT-IML-MAX-1.3B backbone).

Architecture reference: [hf] models/opt/modeling_opt.py — learned positions with offset 2
(:51-100), pre-norm (do_layer_norm_before=True), ReLU MLP, biased linears, optional
word_embed_proj_dim projection. Same pytree/scan/static-cache design as models/qwen2.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import OPTConfig
from audio_flamingo_tpu.models.qwen2 import KVCache
from audio_flamingo_tpu.ops import gqa_attention, layer_norm


def init_cache(cfg: OPTConfig, batch: int, capacity: int, dtype=jnp.bfloat16) -> KVCache:
    hd = cfg.hidden_size // cfg.num_heads
    shape = (cfg.num_layers, batch, capacity, cfg.num_heads, hd)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   index=jnp.zeros((), jnp.int32))


def _linear_init(rng, d_in, d_out):
    scale = d_in ** -0.5
    return {"w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * scale * 0.5,
            "b": jnp.zeros((d_out,), jnp.float32)}


def _layer_init(rng, cfg: OPTConfig):
    d, f = cfg.hidden_size, cfg.ffn_dim
    keys = jax.random.split(rng, 6)
    return {
        "ln1_w": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "q": _linear_init(keys[0], d, d), "k": _linear_init(keys[1], d, d),
        "v": _linear_init(keys[2], d, d), "o": _linear_init(keys[3], d, d),
        "ln2_w": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": _linear_init(keys[4], d, f), "fc2": _linear_init(keys[5], f, d),
    }


def init(rng: jax.Array, cfg: OPTConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 2)
    emb_dim = cfg.word_embed_proj_dim or cfg.hidden_size
    layers = [_layer_init(k, cfg) for k in keys[: cfg.num_layers]]
    params = {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, emb_dim), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(
            keys[-2], (cfg.max_position_embeddings + cfg.position_offset, cfg.hidden_size),
            jnp.float32) * 0.02,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "ln_f_w": jnp.ones((cfg.hidden_size,)), "ln_f_b": jnp.zeros((cfg.hidden_size,)),
    }
    if cfg.word_embed_proj_dim:
        k1, k2 = jax.random.split(keys[0])
        params["project_in"] = jax.random.normal(
            k1, (emb_dim, cfg.hidden_size), jnp.float32) * 0.02
        params["project_out"] = jax.random.normal(
            k2, (cfg.hidden_size, emb_dim), jnp.float32) * 0.02
    return params


def _linear(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


def _layer_forward(x, lp, cfg: OPTConfig, mask, cache_kv=None, cache_index=None):
    b, s, d = x.shape
    nh = cfg.num_heads
    hd = d // nh
    residual = x
    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"]) if cfg.do_layer_norm_before else x
    q = (_linear(h, lp["q"]) * (hd ** -0.5)).reshape(b, s, nh, hd)
    k = _linear(h, lp["k"]).reshape(b, s, nh, hd)
    v = _linear(h, lp["v"]).reshape(b, s, nh, hd)
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
        attn = gqa_attention(q, ck.astype(q.dtype), cv.astype(q.dtype), mask=mask, scale=1.0)
        new_kv = (ck, cv)
    else:
        attn = gqa_attention(q, k, v, mask=mask, scale=1.0)
        new_kv = None
    x = residual + _linear(attn.reshape(b, s, d), lp["o"])
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, lp["ln1_w"], lp["ln1_b"])

    residual = x
    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"]) if cfg.do_layer_norm_before else x
    h = jax.nn.relu(_linear(h, lp["fc1"]))
    x = residual + _linear(h, lp["fc2"])
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
    return x, new_kv


def embed(params, cfg: OPTConfig, token_ids, dtype=jnp.float32):
    x = params["embed"].astype(dtype)[token_ids]
    if "project_in" in params:
        x = jnp.dot(x, params["project_in"].astype(dtype))
    return x


def unembed(params, cfg: OPTConfig, hidden):
    h = hidden
    if "project_out" in params:
        h = jnp.dot(h, params["project_out"].astype(h.dtype))
    return jnp.dot(h.astype(jnp.float32), params["embed"].T.astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def forward(params, cfg: OPTConfig, embeds, positions, cache: KVCache | None = None,
            extra_mask=None, xattn_fn=None):
    """Decoder stack on input embeddings (positions: absolute, offset applied inside).

    xattn_fn: optional callable (layer_idx_array, x) -> x applied BEFORE each layer —
    the Flamingo gated cross-attention insertion point (models/flamingo.py).
    """
    b, s, _ = embeds.shape
    # learned positions with offset 2 ([hf] modeling_opt.py:51-100)
    pos_emb = params["pos_embed"].astype(embeds.dtype)[positions + cfg.position_offset]
    x = embeds + pos_emb

    if cache is not None:
        kv_len = cache.capacity
        kv_pos = jnp.arange(kv_len)[None, None, None, :]
        mask = kv_pos <= positions[:, None, :, None]
    else:
        mask = positions[:, None, :, None] >= positions[:, None, None, :]
    if extra_mask is not None:
        mask = jnp.logical_and(mask, extra_mask)

    if cache is not None:
        def body(carry, xs):
            h = carry
            lp, ck, cv = xs
            h, (nk, nv) = _layer_forward(h, lp, cfg, mask, (ck, cv), cache.index)
            return h, (nk, nv)

        x, (nk, nv) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(nk, nv, cache.index + s)
    else:
        def body(carry, lp):
            h, _ = _layer_forward(carry, lp, cfg, mask)
            return h, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None

    if "ln_f_w" in params:
        x = layer_norm(x, params["ln_f_w"], params["ln_f_b"])
    return x, new_cache


@partial(jax.jit, static_argnames=("cfg",))
def logits_from_ids(params, cfg: OPTConfig, token_ids):
    b, t = token_ids.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    x = embed(params, cfg, token_ids)
    h, _ = forward(params, cfg, x, pos)
    return unembed(params, cfg, h)
