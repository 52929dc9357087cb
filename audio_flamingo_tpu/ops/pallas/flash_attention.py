"""Pallas TPU flash attention (forward): tiled online-softmax attention.

Replaces the reference's FlashAttention-2 CUDA kernels (SURVEY.md §2.10). Numerics must
match ops/attention.gqa_attention (fp32 softmax accumulation) — tested in
tests/test_flash_attention.py against the XLA path.

Layout: q [B, Tq, H, D], k/v [B, Tk, Hkv, D] with H = G*Hkv. Grid: (B*H, Tq/BQ, Tk/BK);
KV tiles stream through the grid's innermost axis with (max, sumexp, acc) persisted in
VMEM scratch — per-program VMEM is O(BQ*D + BK*D), independent of context length (the
round-2 full-KV-per-program layout hit the 16 MB VMEM cliff at ~15-16k tokens). Causal
masking (decode/prefill) via a q_offset; kv-length masking for padded caches; causal
non-contributing tiles skip both compute (pl.when) and DMA (clamped index_map).
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

# KV super-tile size (tokens) streamed per grid step; VMEM per program is
# ~2 x _BLOCK_SUPER x d x 2B x 2 (double-buffer) — 8.4 MB at d=128 bf16 (halved
# for f32 callers below). Swept on-chip at the 15k-token prefill shape:
# (bq=512, bk=1024, super=8192) = 43.6 ms vs 54.9 ms at (256, 512, 4096).
_BLOCK_SUPER = 8192


def _out_struct(shape, dtype, *arrays):
    """ShapeDtypeStruct that works inside shard_map(check_vma=True): outputs inherit
    the union of the inputs' varying-mesh-axes sets (pallas_call cannot infer them)."""
    vma = set()
    for a in arrays:
        v = getattr(jax.core.get_aval(a), "vma", None)
        if v:
            vma |= set(v)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def _dot_precision(dtype):
    """f32 inputs must pin HIGHEST or Mosaic demotes the MXU dot to bf16 passes
    (silent ~1e-2 error — same gotcha as the fused mel kernel). bf16 inputs must
    pin DEFAULT explicitly: precision=None inherits the GLOBAL
    jax_default_matmul_precision, and a global "highest" (the test-suite/parity
    setting) makes Mosaic reject the bf16 matmul ("Bad lhs type")."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                  bq: int, bk: int, bks: int, num_super: int, scale: float,
                  causal: bool, q_offset: int, kv_len: int):
    """Grid (B*H, Tq/bq, Tk/bks): KV streams through the grid's innermost axis in
    SUPER-tiles of bks tokens (bounded VMEM — round 2 loaded the whole [tk, d] K/V
    per program and hit the 16 MB VMEM cliff right at the ~15-16k-token 10-min-audio
    prefill shape), while an inner register-carried fori loops over bk-sized slices
    WITHIN the resident super-tile (amortizes grid-step overhead — a pure
    one-tile-per-grid-step layout costs ~1 us x tens of thousands of steps at 15k
    context, ~50 ms of pure overhead). (m, l, acc) persist across super-tiles in
    VMEM scratch; causal non-contributing super-tiles skip compute (pl.when) and
    DMA (clamped index_map), and the inner loop trip count is causally clamped."""
    qi = pl.program_id(1)
    js = pl.program_id(2)
    # MXU dots run in the INPUT dtype (bf16-native for bf16 callers, full f32 for f32
    # parity callers) with f32 accumulation; softmax statistics are always f32.
    prec = _dot_precision(q_ref.dtype)

    @pl.when(js == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        contributes = js * bks <= qi * bq + bq - 1 + q_offset
    else:
        contributes = js >= 0  # always

    @pl.when(contributes)
    def _compute():
        q = q_ref[0]                                               # [bq, D]
        inner = bks // bk

        def make_body(masked: bool):
            def body(t, carry):
                m, l, acc = carry
                k = k_ref[0, pl.ds(t * bk, bk), :]                 # [bk, D]
                v = v_ref[0, pl.ds(t * bk, bk), :]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec) * scale    # [bq, bk]
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
                    p.astype(q_ref.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                return m_new, l, acc

            return body

        # The iota/compare/select mask work is pure VPU time on a kernel whose
        # measured wall is ~half VPU (docs/TTFT_PERF.md): run MASK-FREE bodies for
        # inner tiles that are fully visible (entirely below the causal frontier
        # AND entirely within kv_len) and the masked body only for the O(1)
        # boundary tiles per (q-block, super-tile). Numerically identical — the
        # mask is removed exactly where it is all-true, and tiles entirely past
        # the frontier/kv_len (which contributed p == 0) are skipped.
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
        # log-sum-exp per query row: the softmax statistic the backward kernels need
        # to reconstruct p = exp(s - lse) without re-running the online recursion.
        lse_ref[0, 0] = (m_scr[...] + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = False, scale: float | None = None,
                    q_offset: int = 0, block_q: int = 512, block_k: int = 1024) -> jnp.ndarray:
    """q [B,Tq,H,D], k/v [B,Tk,Hkv,D] -> [B,Tq,H,D]. GQA via head-index mapping.

    Tq/Tk are padded up to tile multiples internally (padded keys are masked out, padded
    query rows are sliced off), so arbitrary sequence lengths (e.g. 1500) are fine.
    Differentiable: forward AND backward are fused Pallas kernels (FlashAttention-2
    style). The forward additionally stores the per-row log-sum-exp; the backward
    reconstructs p = exp(s - lse) tile-by-tile — O(bq*bk) VMEM instead of O(Tq*Tk) HBM
    — so gradient memory no longer caps training sequence length.
    """
    return _flash_vjp(q, k, v, causal, scale, q_offset, block_q, block_k)


def flash_attention_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                        causal: bool = False, scale: float | None = None,
                        q_offset: int = 0, block_q: int = 512, block_k: int = 1024):
    """Like flash_attention but also returns the per-row log-sum-exp [B, Tq, H] (f32).

    This is the primitive cross-block attention composes on: two partial results
    (out_a, lse_a), (out_b, lse_b) over disjoint KV merge exactly as
    lse = logaddexp(lse_a, lse_b); out = out_a*exp(lse_a-lse) + out_b*exp(lse_b-lse) —
    the mechanism ring attention (parallel/sequence.py) uses so each ring step runs
    this kernel at O(tile) memory instead of materializing block scores.

    Fully differentiable in BOTH outputs: the lse cotangent folds into the fused
    backward's delta term (ds = p*(dp - (delta - g_lse))), so no extra kernel pass.
    """
    return _flash_lse_vjp(q, k, v, causal, scale, q_offset, block_q, block_k)


def _lse_out_layout(lse_raw: jnp.ndarray, b: int, h: int, tq: int) -> jnp.ndarray:
    """[B*H, 1, Tq_pad] kernel layout -> [B, Tq, H] caller layout."""
    return jnp.transpose(lse_raw.reshape(b, h, -1)[:, :, :tq], (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_lse_vjp(q, k, v, causal, scale, q_offset, block_q, block_k):
    out, lse_raw = _flash_forward(q, k, v, causal=causal, scale=scale,
                                  q_offset=q_offset, block_q=block_q, block_k=block_k)
    b, tq, h, _ = q.shape
    return out, _lse_out_layout(lse_raw, b, h, tq)


def _flash_lse_fwd(q, k, v, causal, scale, q_offset, block_q, block_k):
    out, lse_raw = _flash_forward(q, k, v, causal=causal, scale=scale,
                                  q_offset=q_offset, block_q=block_q, block_k=block_k)
    b, tq, h, _ = q.shape
    return (out, _lse_out_layout(lse_raw, b, h, tq)), (q, k, v, out, lse_raw)


def _flash_lse_bwd(causal, scale, q_offset, block_q, block_k, res, g):
    q, k, v, out, lse_raw = res
    g_out, g_lse = g
    return _flash_backward(q, k, v, out, lse_raw, g_out, g_lse, causal=causal,
                           scale=scale, q_offset=q_offset, block_q=block_q,
                           block_k=block_k)


_flash_lse_vjp.defvjp(_flash_lse_fwd, _flash_lse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_vjp(q, k, v, causal, scale, q_offset, block_q, block_k):
    out, _ = _flash_forward(q, k, v, causal=causal, scale=scale, q_offset=q_offset,
                            block_q=block_q, block_k=block_k)
    return out


def _reference_attention(q, k, v, causal, scale, q_offset):
    from audio_flamingo_tpu.ops.attention import causal_mask, gqa_attention

    mask = causal_mask(q.shape[1], k.shape[1], q_offset=q_offset) if causal else None
    return gqa_attention(q, k, v, mask=mask, scale=scale)


def _flash_fwd(q, k, v, causal, scale, q_offset, block_q, block_k):
    out, lse = _flash_forward(q, k, v, causal=causal, scale=scale, q_offset=q_offset,
                              block_q=block_q, block_k=block_k)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, scale, q_offset, block_q, block_k, res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, None, causal=causal, scale=scale,
                           q_offset=q_offset, block_q=block_q, block_k=block_k)


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                                              "q_offset"))
def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   causal: bool = False, scale: float | None = None,
                   q_offset: int = 0, block_q: int = 512, block_k: int = 1024) -> jnp.ndarray:
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

    # KV super-tile: bounded VMEM (~2 x bks x d x 2B x double-buffer), few grid
    # steps. tk re-pads to a bks multiple (over-pad is masked via kv_len).
    sup = _BLOCK_SUPER if q.dtype != jnp.float32 else _BLOCK_SUPER // 2
    bks = min(sup, -(-tk // bk) * bk)
    bks = -(-bks // bk) * bk
    tk_s = -(-tk // bks) * bks
    if tk_s != tk:
        kh_pad = tk_s - tk
        kh = jnp.pad(kh, ((0, 0), (0, kh_pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, kh_pad), (0, 0)))
    num_super = tk_s // bks
    kernel = functools.partial(_flash_kernel, bq=bq, bk=bk, bks=bks,
                               num_super=num_super, scale=scale, causal=causal,
                               q_offset=q_offset, kv_len=kv_len)

    if causal:
        # DMA-skip for non-contributing causal super-tiles: clamp the index so a
        # repeated index means Pallas never refetches the block
        def kv_index(i, qi, j):
            return (i // g, jnp.minimum(j, (qi * bq + bq - 1 + q_offset) // bks), 0)
    else:
        def kv_index(i, qi, j):
            return (i // g, j, 0)

    from jax.experimental.pallas import tpu as pltpu

    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, tq // bq, num_super),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),
            pl.BlockSpec((1, bks, d), kv_index),
            pl.BlockSpec((1, bks, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda i, qi, j: (i, 0, qi)),
        ],
        out_shape=[
            _out_struct((b * h, tq, d), q.dtype, qh, kh, vh),
            _out_struct((b * h, 1, tq), jnp.float32, qh, kh, vh),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(qh, kh, vh)
    out = jnp.swapaxes(out.reshape(b, h, tq, d), 1, 2)
    return out[:, :tq_orig], lse


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          dk_ref, dv_ref, *, bq: int, bk: int, scale: float,
                          causal: bool, q_offset: int, kv_len: int):
    """Grid (B*H, Tk/bk, Tq/bq): innermost q-tile axis accumulates into the resident
    dk/dv output block (index map ignores the q axis)."""
    j = pl.program_id(1)
    qi = pl.program_id(2)
    prec = _dot_precision(q_ref.dtype)

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    def compute():
        # MXU dots stay in the INPUT dtype (bf16-native when training in bf16; full f32
        # only when callers pass f32) with f32 accumulation — softmax math is f32.
        q = q_ref[0]                                               # [bq, D]
        k = k_ref[0]                                               # [bk, D]
        v = v_ref[0]
        do = do_ref[0]                                             # [bq, D]
        lse = lse_ref[0, 0]                                        # [bq]
        delta = delta_ref[0, 0]                                    # [bq]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=prec) * scale  # [bq, bk]
        p = jnp.exp(s - lse[:, None])
        k_ids = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if causal:
            q_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            p = jnp.where(k_ids <= q_ids, p, 0.0)
        p = jnp.where(k_ids < kv_len, p, 0.0)
        pc = p.astype(q.dtype)
        dv_ref[0] += jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32, precision=prec)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=prec)  # [bq, bk]
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dk_ref[0] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32, precision=prec) * scale

    if causal:
        # this (q-tile, kv-tile) pair contributes only if some q can see some k
        pl.when(qi * bq + bq - 1 + q_offset >= j * bk)(compute)
    else:
        compute()


def _flash_bwd_dq_kernel(k_ref, v_ref, do_ref, lse_ref, delta_ref, q_ref,
                         dq_ref, *, bq: int, bk: int, scale: float,
                         causal: bool, q_offset: int, kv_len: int):
    """Grid (B*H, Tq/bq, Tk/bk): innermost kv-tile axis accumulates into dq."""
    qi = pl.program_id(1)
    j = pl.program_id(2)
    prec = _dot_precision(q_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    def compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=prec) * scale
        p = jnp.exp(s - lse[:, None])
        k_ids = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if causal:
            q_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            p = jnp.where(k_ids <= q_ids, p, 0.0)
        p = jnp.where(k_ids < kv_len, p, 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=prec)
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dq_ref[0] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32, precision=prec) * scale

    if causal:
        pl.when(qi * bq + bq - 1 + q_offset >= j * bk)(compute)
    else:
        compute()


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                                              "q_offset"))
def _flash_backward(q, k, v, out, lse, g, g_lse=None, *, causal, scale, q_offset,
                    block_q, block_k):
    """Fused FlashAttention-2 backward. q/k/v/out/g at caller shapes; lse is the padded
    [B*H, 1, Tq_pad] statistic the forward kernel produced. Returns (dq, dk, dv).

    g_lse ([B, Tq, H] or None): cotangent of the log-sum-exp output (flash_attention_lse
    callers). d lse/d s_j = p_j, so it enters the score gradient as
    ds = p*(dp - (delta - g_lse)) — a rowwise shift of delta, no extra kernel work.

    GQA: dk/dv are computed per QUERY head (same i//g block mapping as the forward)
    then summed over each group of g query heads in XLA.
    """
    b, tq, h, d = q.shape
    _, tk, hkv, _ = k.shape
    g_heads = h // hkv
    if scale is None:
        scale = d ** -0.5

    tile = 128
    bq = min(block_q, -(-tq // tile) * tile)
    bk = min(block_k, -(-tk // tile) * tile)
    tq_pad = -(-tq // bq) * bq
    tk_pad = -(-tk // bk) * bk
    kv_len = tk                    # true (unpadded) kv length, masked in-kernel
    tq_orig = tq
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, tq_pad - tq), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, tq_pad - tq), (0, 0), (0, 0)))
    if tk_pad != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_pad - tk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pad - tk), (0, 0), (0, 0)))

    qh = jnp.swapaxes(q, 1, 2).reshape(b * h, tq_pad, d)
    kh = jnp.swapaxes(k, 1, 2).reshape(b * hkv, tk_pad, d)
    vh = jnp.swapaxes(v, 1, 2).reshape(b * hkv, tk_pad, d)
    doh = jnp.swapaxes(g, 1, 2).reshape(b * h, tq_pad, d).astype(q.dtype)
    # delta_i = sum_d dO_i * O_i  (rowwise) — the softmax-jacobian correction term
    delta = jnp.sum(doh.astype(jnp.float32)
                    * jnp.swapaxes(out, 1, 2).reshape(b * h, tq_pad, d)
                    .astype(jnp.float32), axis=-1)[:, None, :]     # [B*H, 1, Tq]
    if g_lse is not None:
        # lse cotangent: ds_j = p_j*(dp_j - delta + g_lse) == shift delta by -g_lse
        gl = jnp.transpose(g_lse.astype(jnp.float32), (0, 2, 1))   # [B, H, Tq]
        if tq_pad != tq_orig:
            gl = jnp.pad(gl, ((0, 0), (0, 0), (0, tq_pad - tq_orig)))
        delta = delta - gl.reshape(b * h, 1, tq_pad)

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, bq=bq, bk=bk, scale=scale,
                                   causal=causal, q_offset=q_offset, kv_len=kv_len)
    dk_h, dv_h = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, tk_pad // bk, tq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, qi: (i, qi, 0)),        # q
            pl.BlockSpec((1, bq, d), lambda i, j, qi: (i, qi, 0)),        # do
            pl.BlockSpec((1, 1, bq), lambda i, j, qi: (i, 0, qi)),        # lse
            pl.BlockSpec((1, 1, bq), lambda i, j, qi: (i, 0, qi)),        # delta
            pl.BlockSpec((1, bk, d), lambda i, j, qi: (i // g_heads, j, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda i, j, qi: (i // g_heads, j, 0)),  # v
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, j, qi: (i, j, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, qi: (i, j, 0)),
        ],
        out_shape=[
            _out_struct((b * h, tk_pad, d), jnp.float32, qh, kh, vh, doh),
            _out_struct((b * h, tk_pad, d), jnp.float32, qh, kh, vh, doh),
        ],
        interpret=_interpret(),
    )(qh, doh, lse, delta, kh, vh)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, bq=bq, bk=bk, scale=scale,
                                  causal=causal, q_offset=q_offset, kv_len=kv_len)
    dq_h = pl.pallas_call(
        dq_kernel,
        grid=(b * h, tq_pad // bq, tk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bk, d), lambda i, qi, j: (i // g_heads, j, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda i, qi, j: (i // g_heads, j, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),        # do
            pl.BlockSpec((1, 1, bq), lambda i, qi, j: (i, 0, qi)),        # lse
            pl.BlockSpec((1, 1, bq), lambda i, qi, j: (i, 0, qi)),        # delta
            pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),        # q
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, qi, j: (i, qi, 0)),
        out_shape=_out_struct((b * h, tq_pad, d), jnp.float32, qh, kh, vh, doh),
        interpret=_interpret(),
    )(kh, vh, doh, lse, delta, qh)

    dq = jnp.swapaxes(dq_h.reshape(b, h, tq_pad, d), 1, 2)[:, :tq_orig]
    # sum query-head groups back onto their shared KV head
    dk = dk_h.reshape(b, hkv, g_heads, tk_pad, d).sum(axis=2)
    dv = dv_h.reshape(b, hkv, g_heads, tk_pad, d).sum(axis=2)
    dk = jnp.swapaxes(dk, 1, 2)[:, :kv_len]
    dv = jnp.swapaxes(dv, 1, 2)[:, :kv_len]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
