"""Pallas TPU flash attention (forward): tiled online-softmax attention.

Replaces the reference's FlashAttention-2 CUDA kernels (SURVEY.md §2.10). Numerics must
match ops/attention.gqa_attention (fp32 softmax accumulation) — tested in
tests/test_flash_attention.py against the XLA path.

Layout: q [B, Tq, H, D], k/v [B, Tk, Hkv, D] with H = G*Hkv. Grid: (B*H, Tq/BQ); each
program streams KV tiles of size BK with running (max, sumexp, acc) state — O(BQ*BK)
VMEM instead of O(Tq*Tk) HBM for scores. Supports causal masking (decode/prefill) via a
q_offset and kv length masking for padded caches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    """Pallas compiled mode needs a TPU; interpret transparently on CPU (tests/fallback)."""
    import jax

    return jax.default_backend() == "cpu"


NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, bq: int, bk: int, tk: int,
                  scale: float, causal: bool, q_offset: int, kv_len: int):
    # q_ref: [1, bq, D]; k_ref/v_ref: [1, tk, D] (full K/V for this head); o_ref: [1, bq, D]
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale                       # [bq, D]

    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q_ref.shape[-1]), jnp.float32)

    num_kv = tk // bk

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)     # [bk, D]
        v = v_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, bk]
        if causal:
            q_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            k_ids = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_ids <= q_ids, s, NEG_INF)
        if kv_len < tk:
            k_ids = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_ids < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32)
        return m_new, l, acc

    if causal:
        # only KV tiles that can pass the causal test: k_id_min <= q_id_max
        max_q_id = qi * bq + bq - 1 + q_offset
        num_kv_needed = jnp.minimum(num_kv, (max_q_id // bk) + 1)
        m, l, acc = jax.lax.fori_loop(0, num_kv_needed, body, (m, l, acc))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = False, scale: float | None = None,
                    q_offset: int = 0, block_q: int = 256, block_k: int = 512) -> jnp.ndarray:
    """q [B,Tq,H,D], k/v [B,Tk,Hkv,D] -> [B,Tq,H,D]. GQA via head-index mapping.

    Tq/Tk are padded up to tile multiples internally (padded keys are masked out, padded
    query rows are sliced off), so arbitrary sequence lengths (e.g. 1500) are fine.
    Differentiable: forward is the Pallas kernel; the backward recomputes attention
    through the XLA reference (O(T^2) memory in the backward only — a fused flash
    backward kernel is a round-2 item; forward-only inference is unaffected).
    """
    return _flash_vjp(q, k, v, causal, scale, q_offset, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_vjp(q, k, v, causal, scale, q_offset, block_q, block_k):
    return _flash_forward(q, k, v, causal=causal, scale=scale, q_offset=q_offset,
                          block_q=block_q, block_k=block_k)


def _reference_attention(q, k, v, causal, scale, q_offset):
    from audio_flamingo_tpu.ops.attention import causal_mask, gqa_attention

    mask = causal_mask(q.shape[1], k.shape[1], q_offset=q_offset) if causal else None
    return gqa_attention(q, k, v, mask=mask, scale=scale)


def _flash_fwd(q, k, v, causal, scale, q_offset, block_q, block_k):
    out = _flash_forward(q, k, v, causal=causal, scale=scale, q_offset=q_offset,
                         block_q=block_q, block_k=block_k)
    return out, (q, k, v)


def _flash_bwd(causal, scale, q_offset, block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, causal, scale,
                                                          q_offset), q, k, v)
    return vjp(g)


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                                              "q_offset"))
def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   causal: bool = False, scale: float | None = None,
                   q_offset: int = 0, block_q: int = 256, block_k: int = 512) -> jnp.ndarray:
    b, tq, h, d = q.shape
    _, tk, hkv, _ = k.shape
    assert h % hkv == 0
    g = h // hkv
    if scale is None:
        scale = d ** -0.5

    # pad sequence lengths to block multiples (blocks themselves are 128-aligned)
    tile = 128
    bq = min(block_q, -(-tq // tile) * tile)
    bk = min(block_k, -(-tk // tile) * tile)
    tq_pad = -(-tq // bq) * bq
    tk_pad = -(-tk // bk) * bk
    kv_len = tk
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0), (0, 0)))
    if tk_pad != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_pad - tk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pad - tk), (0, 0), (0, 0)))
    tq_orig, tq, tk = tq, tq_pad, tk_pad

    assert tq % bq == 0, (tq, bq)
    assert tk % bk == 0, (tk, bk)

    # [B, H, Tq, D] program layout
    qh = jnp.swapaxes(q, 1, 2).reshape(b * h, tq, d)
    kh = jnp.swapaxes(k, 1, 2).reshape(b * hkv, tk, d)
    vh = jnp.swapaxes(v, 1, 2).reshape(b * hkv, tk, d)

    kernel = functools.partial(_flash_kernel, bq=bq, bk=bk, tk=tk, scale=scale,
                               causal=causal, q_offset=q_offset, kv_len=kv_len)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, tq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk, d), lambda i, j: (i // g, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda i, j: (i // g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        interpret=_interpret(),
    )(qh, kh, vh)
    out = jnp.swapaxes(out.reshape(b, h, tq, d), 1, 2)
    return out[:, :tq_orig]
