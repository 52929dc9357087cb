"""Attention ops: grouped-query attention with optional causal mask and KV cache reads.

Numerical reference: [hf] models/qwen2/modeling_qwen2.py:84-186 (repeat_kv + scaled dot
product, softmax in fp32) and [hf] models/whisper/modeling_whisper.py:372-433 (bidirectional
MHA). This is the XLA path; the Pallas flash kernel in ops/pallas/flash_attention.py is the
fused fast path and must match it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def gqa_attention(
    q: jnp.ndarray,          # [batch, q_len, num_heads, head_dim]
    k: jnp.ndarray,          # [batch, kv_len, num_kv_heads, head_dim]
    v: jnp.ndarray,          # [batch, kv_len, num_kv_heads, head_dim]
    mask: jnp.ndarray | None = None,  # bool [batch, 1|num_heads, q_len, kv_len]; True = attend
    scale: float | None = None,
) -> jnp.ndarray:
    """Grouped-query attention. Softmax in fp32; output in q.dtype.

    KV heads are NOT materialized per-q-head (no repeat_kv copy like the torch reference);
    grouping is expressed in the einsum so XLA keeps the broadcast implicit.
    """
    b, q_len, nh, hd = q.shape
    _, kv_len, nkv, _ = k.shape
    assert nh % nkv == 0, (nh, nkv)
    group = nh // nkv
    if scale is None:
        scale = hd ** -0.5

    qg = q.reshape(b, q_len, nkv, group, hd)
    # scores: [b, nkv, group, q_len, kv_len]
    scores = jnp.einsum("bqkgh,bskh->bkgqs", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        if mask.ndim == 4:  # [b, 1|nh, q, s] -> broadcast over (nkv, group)
            if mask.shape[1] == 1:
                m = mask[:, :, None, :, :]
            else:
                m = mask.reshape(b, nkv, group, q_len, kv_len)
        else:
            raise ValueError(f"mask must be rank-4, got {mask.shape}")
        scores = jnp.where(m, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskh->bqkgh", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, q_len, nh, hd).astype(q.dtype)


def gqa_attention_q8(
    q: jnp.ndarray,          # [batch, q_len, num_heads, head_dim]
    k_q: jnp.ndarray,        # [batch, kv_len, num_kv_heads, head_dim] int8
    v_q: jnp.ndarray,        # int8
    k_scale: jnp.ndarray,    # [batch, kv_len, num_kv_heads] f32 per-token scales
    v_scale: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """GQA attention DIRECTLY on an int8 KV cache — no dequantized copy.

    score(t) = (q . k_int8[t]) * k_scale[t]: the per-token scale folds into the
    score column AFTER the dot, and v_scale folds into the probability row BEFORE
    the PV dot — the same factorization the Pallas paged-attention kernel uses
    (ops/pallas/paged_attention.py). The int8->bf16 converts fuse into the dots,
    so HBM traffic per step is the int8 cache bytes, not a materialized f32/bf16
    cache (the previous dequant-then-attend spent ~3x the cache bytes per layer:
    dequant read+write+attend read; at 7B b1x8k that was ~2 ms/step of pure
    copy). Numerics match dequant-then-attend up to bf16 rounding on the dots.
    """
    b, q_len, nh, hd = q.shape
    _, kv_len, nkv, _ = k_q.shape
    assert nh % nkv == 0, (nh, nkv)
    group = nh // nkv
    if scale is None:
        scale = hd ** -0.5

    qg = q.reshape(b, q_len, nkv, group, hd)
    scores = jnp.einsum("bqkgh,bskh->bkgqs", qg, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    # fold the per-token k scale into each score column, then the softmax scale
    scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :] * scale
    if mask is not None:
        if mask.ndim == 4:  # [b, 1|nh, q, s] -> broadcast over (nkv, group)
            if mask.shape[1] == 1:
                m = mask[:, :, None, :, :]
            else:
                m = mask.reshape(b, nkv, group, q_len, kv_len)
        else:
            raise ValueError(f"mask must be rank-4, got {mask.shape}")
        scores = jnp.where(m, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # fold the per-token v scale into the probability rows (f32), then one PV dot
    probs = (probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskh->bqkgh", probs, v_q.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, q_len, nh, hd).astype(q.dtype)


def causal_mask(q_len: int, kv_len: int, q_offset: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Boolean causal mask [1, 1, q_len, kv_len]; True = attend.

    q position i (global index q_offset + i) may attend to kv positions <= its global index.
    """
    q_ids = jnp.arange(q_len)[:, None] + q_offset
    kv_ids = jnp.arange(kv_len)[None, :]
    return (kv_ids <= q_ids)[None, None]


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[batch] lengths -> bool [batch, 1, 1, max_len] key-padding mask (True = valid)."""
    ids = jnp.arange(max_len)[None, :]
    return (ids < lengths[:, None])[:, None, None, :]
