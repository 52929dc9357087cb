"""Rotary position embeddings (RoPE), Qwen2 semantics.

Numerical reference: [hf] models/qwen2/modeling_qwen2.py:50-83 (rotate_half convention:
first half / second half split, NOT interleaved) and :273-309 (inv_freq table, fp32
cos/sin computed from position_ids).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray,  # [..., seq] int32 positions
    head_dim: int,
    theta: float = 1_000_000.0,
    dtype: jnp.dtype = jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape [..., seq, head_dim] (frequencies duplicated across halves)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., seq, head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)               # [..., seq, head_dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # [batch, seq, heads, head_dim]
    k: jnp.ndarray,  # [batch, seq, kv_heads, head_dim]
    cos: jnp.ndarray,  # [batch, seq, head_dim] or [seq, head_dim]
    sin: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply RoPE to q and k (seq axis = -3, heads axis = -2)."""
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    q_rot = q * cos.astype(q.dtype) + _rotate_half(q) * sin.astype(q.dtype)
    k_rot = k * cos.astype(k.dtype) + _rotate_half(k) * sin.astype(k.dtype)
    return q_rot, k_rot
