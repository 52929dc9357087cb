"""Int8-QK flash attention (forward-only): quantized QK^T on the MXU's 2x int8 rate.

TTFT lever named by docs/TTFT_PERF.md: at the 10-min AF3 prefill shape the LM's
prefill attention is the largest non-peak component (~517 ms at ~48% MXU), and the
w8a8 matmuls around it already sit at 91% of the int8 roofline. This kernel quantizes
the score dot (half the attention FLOPs):

- Q: per-ROW (token x head) int8 with f32 scales — rows are independent softmax
  problems, so a per-row scale folds into the s dequantization as one broadcast
  multiply (with the K scale and the softmax scale), not an outer product.
- K: ONE scalar scale per head, after subtracting the per-head K MEAN.
  The mean shift q . mean_k is constant per query row across every key of the head,
  so the softmax is INVARIANT to it (SageAttention-style smoothing) — it costs
  nothing in-kernel and removes the common-mode component (RoPE'd keys carry one)
  that otherwise eats the int8 range.
- P x V stays bf16: softmax weights are mostly far below 1/127, so int8 P at any
  per-row scale (the row max is always 1) destroys diffuse-attention rows — measured
  0.1+ relative band vs 0.01 for QK-only int8. The PV dot is the cheap half anyway
  (N = d = 128 narrow).

Numerics are a tolerance band, NOT parity (like ops/quant.q_matmul_a8): gated by
tests/test_flash_attention_a8.py against the f32 reference and measured on-chip as a
logit-divergence delta in bench_ttft. The parity-critical path stays
flash_attention (bf16/f32).

Same grid/streaming layout as flash_attention.py (KV super-tiles through the grid's
innermost axis, boundary-split masking so mask VPU work only touches frontier tiles).
Semantic reference for the attention math: [hf] models/qwen2/modeling_qwen2.py:122-186.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from audio_flamingo_tpu.ops.pallas.flash_attention import (NEG_INF, _dot_precision,
                                                           _interpret, _out_struct)

_BLOCK_SUPER = 8192


def _a8_kernel(rowc_ref, q_ref, k_ref, v_ref, o_ref,
               m_scr, l_scr, acc_scr, *, bq: int, bk: int, bks: int,
               num_super: int, scale: float, causal: bool, q_offset: int,
               kv_len: int):
    qi = pl.program_id(1)
    js = pl.program_id(2)
    pv_prec = _dot_precision(v_ref.dtype)

    @pl.when(js == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        contributes = js * bks <= qi * bq + bq - 1 + q_offset
    else:
        contributes = js >= 0

    @pl.when(contributes)
    def _compute():
        q = q_ref[0]                                               # [bq, D] int8
        inner = bks // bk
        # per-row dequant factor (q row scale x K head scale x softmax scale),
        # precomputed outside — sublane-major [bq, 1] so no in-kernel transpose
        row_c = rowc_ref[0]                                        # [bq, 1] f32

        def make_body(masked: bool):
            def body(t, carry):
                m, l, acc = carry
                k = k_ref[0, pl.ds(t * bk, bk), :]                 # [bk, D] int8
                v = v_ref[0, pl.ds(t * bk, bk), :]                 # [bk, D] bf16
                s_i = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                s = s_i.astype(jnp.float32) * row_c                # [bq, bk]
                if masked:
                    k_ids = js * bks + t * bk + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, bk), 1)
                    if causal:
                        q_ids = qi * bq + jax.lax.broadcasted_iota(
                            jnp.int32, (bq, bk), 0) + q_offset
                        s = jnp.where(k_ids <= q_ids, s, NEG_INF)
                    if kv_len < num_super * bks:
                        s = jnp.where(k_ids < kv_len, s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=pv_prec)
                return m_new, l, acc

            return body

        # boundary-split (flash_attention.py rationale): mask-free bodies for fully
        # visible tiles, masked body only for the O(1) frontier tiles
        if causal:
            min_q_id = qi * bq + q_offset
            max_q_id = qi * bq + bq - 1 + q_offset
            n_free_c = jnp.clip((min_q_id + 1 - js * bks) // bk, 0, inner)
            n_in_c = jnp.clip((max_q_id - js * bks) // bk + 1, 0, inner)
        else:
            n_free_c = inner
            n_in_c = inner
        if kv_len < num_super * bks:
            n_free_k = jnp.clip((kv_len - js * bks) // bk, 0, inner)
            n_in_k = jnp.clip(-(-(kv_len - js * bks) // bk), 0, inner)
        else:
            n_free_k = inner
            n_in_k = inner
        n_free = jnp.minimum(n_free_c, n_free_k)
        n_in = jnp.minimum(n_in_c, n_in_k)
        carry = (m_scr[...], l_scr[...], acc_scr[...])
        carry = jax.lax.fori_loop(0, n_free, make_body(False), carry)
        m, l, acc = jax.lax.fori_loop(n_free, n_in, make_body(True), carry)
        m_scr[...] = m
        l_scr[...] = l
        acc_scr[...] = acc

    @pl.when(js == num_super - 1)
    def _finish():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                                             "q_offset"))
def flash_attention_a8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                       causal: bool = False, scale: float | None = None,
                       q_offset: int = 0, block_q: int = 512,
                       block_k: int = 1024) -> jnp.ndarray:
    """q [B,Tq,H,D], k/v [B,Tk,Hkv,D] float -> [B,Tq,H,D] in q.dtype (GQA via
    head-index mapping). Forward-only; serving prefill path (no VJP)."""
    b, tq, h, d = q.shape
    _, tk, hkv, _ = k.shape
    assert h % hkv == 0
    g = h // hkv
    if scale is None:
        scale = d ** -0.5

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

    qh = jnp.swapaxes(q, 1, 2).reshape(b * h, tq, d).astype(jnp.float32)
    kh = jnp.swapaxes(k, 1, 2).reshape(b * hkv, tk, d).astype(jnp.float32)
    vh = jnp.swapaxes(v, 1, 2).reshape(b * hkv, tk, d).astype(jnp.bfloat16)

    bks = min(_BLOCK_SUPER, -(-tk // bk) * bk)
    bks = -(-bks // bk) * bk
    tk_s = -(-tk // bks) * bks
    if tk_s != tk:
        kh = jnp.pad(kh, ((0, 0), (0, tk_s - tk), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, tk_s - tk), (0, 0)))
    num_super = tk_s // bks

    # --- K smoothing: subtract the per-head mean over VALID keys. q . mean_k is a
    # per-row constant over all of the head's keys, so softmax(s) is invariant;
    # what remains in K is the zero-mean part the int8 range should spend itself on.
    k_mean = kh[:, :kv_len].mean(axis=1, keepdims=True)                # [B*Hkv, 1, D]
    kh = kh - k_mean
    if tk_s != kv_len:
        # keep padded rows at zero so they never dominate the tile absmax
        pad_ids = jnp.arange(tk_s)[None, :, None] >= kv_len
        kh = jnp.where(pad_ids, 0.0, kh)

    # --- quantization (XLA-fused single sweeps; zero-padding never raises absmax)
    qs = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1), 1e-6) / 127.0      # [B*H, Tq]
    q_i8 = jnp.clip(jnp.round(qh / qs[..., None]), -127, 127).astype(jnp.int8)
    ks = jnp.maximum(jnp.max(jnp.abs(kh), axis=(1, 2)), 1e-6) / 127.0  # [B*Hkv]
    k_i8 = jnp.clip(jnp.round(kh / ks[:, None, None]), -127, 127).astype(jnp.int8)
    # per-row dequant factor, sublane-major for a transpose-free [bq, 1] block read
    rowc = (qs.reshape(b, h, tq) * ks.reshape(b, hkv, 1, 1).repeat(g, axis=1)
            .reshape(b, h, 1) * scale)
    rowc_l = rowc.reshape(b * h, tq, 1)

    kernel = functools.partial(_a8_kernel, bq=bq, bk=bk, bks=bks,
                               num_super=num_super, scale=scale, causal=causal,
                               q_offset=q_offset, kv_len=kv_len)

    if causal:
        def kv_index(i, qi, j):
            return (i // g, jnp.minimum(j, (qi * bq + bq - 1 + q_offset) // bks), 0)
    else:
        def kv_index(i, qi, j):
            return (i // g, j, 0)

    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=(b * h, tq // bq, num_super),
        in_specs=[
            pl.BlockSpec((1, bq, 1), lambda i, qi, j: (i, qi, 0)),       # row_c
            pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),       # q int8
            pl.BlockSpec((1, bks, d), kv_index),                         # k int8
            pl.BlockSpec((1, bks, d), kv_index),                         # v bf16
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),
        out_shape=_out_struct((b * h, tq, d), q.dtype, qh, kh, vh),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(rowc_l, q_i8, k_i8, vh)
    out = jnp.swapaxes(out.reshape(b, h, tq, d), 1, 2)
    return out[:, :tq_orig]
