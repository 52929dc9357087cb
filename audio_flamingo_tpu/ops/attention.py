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
