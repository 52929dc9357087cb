"""CLAP text tower (RoBERTa-style) + contrastive loss — completes the AF-CLAP retraining
story (AF2 retrains CLAP with stronger text understanding, README.md:172).

Architecture reference (golden-tested): [hf] models/clap/modeling_clap.py —
ClapTextModel :1477 (RoBERTa embeddings with pad-offset position ids :101-118, post-LN
encoder), ClapTextPooler :1359 (tanh over [CLS]), projection :980-998, symmetric
contrastive loss :119-126 and logit scales :1600-1601.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops import gqa_attention, layer_norm


@dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50_265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512


def _lin(rng, a, b):
    return {"w": jax.random.normal(rng, (a, b), jnp.float32) * (a ** -0.5) * 0.5,
            "b": jnp.zeros((b,), jnp.float32)}


def init(rng: jax.Array, cfg: ClapTextConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_layers * 6 + 8)
    ki = iter(keys)
    d, f = cfg.hidden_size, cfg.intermediate_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "q": _lin(next(ki), d, d), "k": _lin(next(ki), d, d), "v": _lin(next(ki), d, d),
            "o": _lin(next(ki), d, d),
            "ln_attn_w": jnp.ones((d,)), "ln_attn_b": jnp.zeros((d,)),
            "fc1": _lin(next(ki), d, f), "fc2": _lin(next(ki), f, d),
            "ln_out_w": jnp.ones((d,)), "ln_out_b": jnp.zeros((d,)),
        })
    return {
        "word_emb": jax.random.normal(next(ki), (cfg.vocab_size, d)) * 0.02,
        "pos_emb": jax.random.normal(next(ki), (cfg.max_position_embeddings, d)) * 0.02,
        "type_emb": jax.random.normal(next(ki), (cfg.type_vocab_size, d)) * 0.02,
        "ln_emb_w": jnp.ones((d,)), "ln_emb_b": jnp.zeros((d,)),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "pooler": _lin(next(ki), d, d),
        "projection": {"fc1": _lin(next(ki), d, cfg.projection_dim),
                       "fc2": _lin(next(ki), cfg.projection_dim, cfg.projection_dim)},
    }


def _linear(x, p):
    return (jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
            .astype(x.dtype) + p["b"].astype(x.dtype))


@partial(jax.jit, static_argnames=("cfg",))
def encode(params: dict, cfg: ClapTextConfig, input_ids: jnp.ndarray,
           attention_mask: jnp.ndarray | None = None) -> dict:
    """[B, T] ids -> {'pooled': [B, d], 'embeds': [B, proj] normalized}."""
    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    # RoBERTa position ids: pad positions get pad_idx, others pad_idx + cumsum(mask)
    pos_ids = jnp.cumsum(attention_mask, axis=1) * attention_mask + cfg.pad_token_id
    x = (params["word_emb"][input_ids] + params["pos_emb"][pos_ids]
         + params["type_emb"][jnp.zeros_like(input_ids)])
    x = layer_norm(x, params["ln_emb_w"], params["ln_emb_b"], eps=cfg.layer_norm_eps)

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    mask = attention_mask[:, None, None, :].astype(bool)

    def body(h, lp):
        q = _linear(h, lp["q"]).reshape(b, t, nh, hd)
        k = _linear(h, lp["k"]).reshape(b, t, nh, hd)
        v = _linear(h, lp["v"]).reshape(b, t, nh, hd)
        attn = gqa_attention(q, k, v, mask=mask).reshape(b, t, cfg.hidden_size)
        h = layer_norm(h + _linear(attn, lp["o"]), lp["ln_attn_w"], lp["ln_attn_b"],
                       eps=cfg.layer_norm_eps)
        ffn = _linear(jax.nn.gelu(_linear(h, lp["fc1"]), approximate=False), lp["fc2"])
        return layer_norm(h + ffn, lp["ln_out_w"], lp["ln_out_b"],
                          eps=cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = jnp.tanh(_linear(x[:, 0], params["pooler"]))
    proj = _linear(jax.nn.relu(_linear(pooled, params["projection"]["fc1"])),
                   params["projection"]["fc2"])
    embeds = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
    return {"pooled": pooled, "embeds": embeds}


def contrastive_loss(audio_embeds: jnp.ndarray, text_embeds: jnp.ndarray,
                     logit_scale_a: jnp.ndarray, logit_scale_t: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE over normalized embeddings ([hf] modeling_clap.py:119-126,
    caption_loss + audio_loss over the two logit matrices)."""
    logits_per_text = text_embeds @ audio_embeds.T * jnp.exp(logit_scale_t)
    logits_per_audio = audio_embeds @ text_embeds.T * jnp.exp(logit_scale_a)
    labels = jnp.arange(text_embeds.shape[0])

    def ce(lg):
        return -jnp.take_along_axis(jax.nn.log_softmax(lg, axis=-1), labels[:, None],
                                    axis=-1).mean()

    return 0.5 * (ce(logits_per_text) + ce(logits_per_audio))
