"""Fused w4 decode layer-suffix kernels: 2 pallas_calls per transformer layer.

A pallas_call costs ~27 us FIXED on this backend (scripts/profile_w4e.py), so at
7B decode the 4-call fused path (qkv / o / gateup / down) still pays ~3.1 ms of
launch tax per token. These two kernels split each layer's matmul work around
the attention (which stays in XLA / the paged kernel):

  suffix A:  attn_out -> o-proj -> +residual -> rms_norm -> gate|up -> silu*mul
  suffix B:  act -> down-proj -> +residual -> rms_norm(next ln1) -> qkv(next)

so a decode layer costs exactly TWO launches (A and B; B also produces the NEXT
layer's qkv, seeded by one standalone qkv call for layer 0). Each kernel runs a
1-D "phase" grid: the first phase's k-steps stream the first weight matrix, the
second phase's (chunk, k) steps stream the second; BlockSpec index maps park a
weight's index during the foreign phase, which Pallas treats as "unchanged
block" and skips the re-fetch. Intermediates (h, rms-normed h, the gate|up
accumulator) live in VMEM scratch, and the norms run on the VPU between phases.

Weights/scales are the layer-STACKED packed arrays of ops/quant4.py (fuse=True),
indexed by prefetched layer ids in the BlockSpec maps — no per-layer slices.
Group scales are applied to the f32 partial product after each group dot, same
math as quant4_matmul.py, so results match the 4-call path to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_flamingo_tpu.ops.pallas.quant4_matmul import _interpret, _pick_bkp

VMEM_WBLOCK = 5 << 19   # 2.5 MB weight-block cap (16 MB scoped VMEM on v5e)


def _shrink_bn(bkp: int, n: int) -> int:
    bn = n
    while bkp * bn > VMEM_WBLOCK and bn % 2 == 0 and (bn // 2) % 128 == 0:
        bn //= 2
    assert n % bn == 0, (n, bn)
    return bn


def _geom(k: int, n: int, n_groups: int):
    """Phase geometry for one [K, N] w4 matmul: (group, kp, bkp, bn, ksteps, nchunks)."""
    group = k // n_groups
    kp = k // 2
    kp_groups = kp // group
    bkp = _pick_bkp(kp_groups, group)
    bn = _shrink_bn(bkp, n)
    return group, kp, bkp, bn, kp // bkp, n // bn


def _group_dots(acc, x_ref_or_scr, xcol0, wp_blk, s_ref, s_base_rows, kj, *,
                bkp, kp, group, dtype):
    """Accumulate one packed k-block: two dots per group (lo/hi halves), scales
    folded into the f32 partial products. x columns come from a ref or scratch
    at dynamic offset xcol0 (+kp for the high half)."""
    w = wp_blk.astype(jnp.int32)
    lo = ((w << 28) >> 28).astype(dtype)
    hi = ((w << 24) >> 28).astype(dtype)
    base = kj * (bkp // group)
    for g in range(bkp // group):
        xl = x_ref_or_scr[:, pl.dslice(xcol0 + g * group, group)].astype(dtype)
        xh = x_ref_or_scr[:, pl.dslice(xcol0 + kp + g * group, group)].astype(dtype)
        sl = slice(g * group, (g + 1) * group)
        ylo = jax.lax.dot_general(xl, lo[sl, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        yhi = jax.lax.dot_general(xh, hi[sl, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        lo_row = s_base_rows + base + g
        hi_row = s_base_rows + (kp // group) + base + g
        acc += (ylo * s_ref[0, pl.dslice(lo_row, 1), :].astype(jnp.float32)
                + yhi * s_ref[0, pl.dslice(hi_row, 1), :].astype(jnp.float32))
    return acc


def _rms(h, w, eps):
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    return (h * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)


def _suffix_a_kernel(layer_ref, attn_ref, hres_ref, ln2_ref, wo_ref, so_ref,
                     wg_ref, sg_ref, act_ref, hout_ref, h_scr, gu_scr, acc_scr,
                     *, geo_o, geo_g, d, f, eps):
    group_o, kp_o, bkp_o, bn_o, ks_o, nc_o = geo_o
    group_g, kp_g, bkp_g, bn_g, ks_g, nc_g = geo_g
    So = nc_o * ks_o
    step = pl.program_id(0)
    dt = attn_ref.dtype

    # ---- phase o: o-projection chunks into h_scr (+ residual) ----
    @pl.when(step < So)
    def _():
        c = step // ks_o
        kj = step % ks_o

        @pl.when(kj == 0)
        def _():
            acc_scr[:, :bn_o] = jnp.zeros_like(acc_scr[:, :bn_o])

        acc = _group_dots(acc_scr[:, :bn_o], attn_ref, kj * bkp_o, wo_ref[0],
                          so_ref, 0, kj, bkp=bkp_o, kp=kp_o, group=group_o,
                          dtype=dt)
        acc_scr[:, :bn_o] = acc

        @pl.when(kj == ks_o - 1)
        def _():
            h_scr[:, pl.dslice(c * bn_o, bn_o)] = (
                acc_scr[:, :bn_o]
                + hres_ref[:, pl.dslice(c * bn_o, bn_o)].astype(jnp.float32))

    # ---- boundary: rms_norm(h) * ln2 -> overwrite gu x source ----
    @pl.when(step == So)
    def _():
        h = h_scr[:, :d]
        gu_scr[:, :d] = _rms(h, ln2_ref[0, :], eps)   # reuse gu_scr head as hn

    # ---- phase gu: gate|up chunks into gu_scr tail ----
    @pl.when(step >= So)
    def _():
        t = step - So
        c = t // ks_g
        kj = t % ks_g

        @pl.when(kj == 0)
        def _():
            acc_scr[:, :bn_g] = jnp.zeros_like(acc_scr[:, :bn_g])

        acc = _group_dots(acc_scr[:, :bn_g], gu_scr, kj * bkp_g, wg_ref[0],
                          sg_ref, 0, kj, bkp=bkp_g, kp=kp_g, group=group_g,
                          dtype=dt)
        acc_scr[:, :bn_g] = acc

        @pl.when(kj == ks_g - 1)
        def _():
            gu_scr[:, pl.dslice(d + c * bn_g, bn_g)] = acc_scr[:, :bn_g]

    # ---- final: act = silu(gate) * up; emit act + h ----
    @pl.when(step == So + nc_g * ks_g - 1)
    def _():
        gate = gu_scr[:, pl.dslice(d, f)]
        up = gu_scr[:, pl.dslice(d + f, f)]
        act_ref[:] = (jax.nn.silu(gate) * up).astype(act_ref.dtype)
        hout_ref[:] = h_scr[:, :d].astype(hout_ref.dtype)


def _suffix_b_kernel(layer_ref, nxt_ref, act_ref, h_ref, ln1n_ref, wd_ref,
                     sd_ref, wq_ref, sq_ref, hout_ref, qkv_ref, h_scr, acc_scr,
                     *, geo_d, geo_q, d, n_qkv, eps):
    group_d, kp_d, bkp_d, bn_d, ks_d, nc_d = geo_d
    group_q, kp_q, bkp_q, bn_q, ks_q, nc_q = geo_q
    Sd = nc_d * ks_d
    step = pl.program_id(0)
    dt = act_ref.dtype

    # ---- phase down: down-projection chunks into h_scr head (+ residual) ----
    @pl.when(step < Sd)
    def _():
        c = step // ks_d
        kj = step % ks_d

        @pl.when(kj == 0)
        def _():
            acc_scr[:, :bn_d] = jnp.zeros_like(acc_scr[:, :bn_d])

        acc = _group_dots(acc_scr[:, :bn_d], act_ref, kj * bkp_d, wd_ref[0],
                          sd_ref, 0, kj, bkp=bkp_d, kp=kp_d, group=group_d,
                          dtype=dt)
        acc_scr[:, :bn_d] = acc

        @pl.when(kj == ks_d - 1)
        def _():
            h_scr[:, pl.dslice(c * bn_d, bn_d)] = (
                acc_scr[:, :bn_d]
                + h_ref[:, pl.dslice(c * bn_d, bn_d)].astype(jnp.float32))

    # ---- boundary: next layer's input norm into h_scr tail ----
    @pl.when(step == Sd)
    def _():
        h2 = h_scr[:, :d]
        h_scr[:, pl.dslice(d, d)] = _rms(h2, ln1n_ref[0, :], eps)

    # ---- phase qkv(next) ----
    @pl.when(step >= Sd)
    def _():
        t = step - Sd
        c = t // ks_q
        kj = t % ks_q

        @pl.when(kj == 0)
        def _():
            acc_scr[:, :bn_q] = jnp.zeros_like(acc_scr[:, :bn_q])

        acc = _group_dots(acc_scr[:, :bn_q], h_scr, d + kj * bkp_q, wq_ref[0],
                          sq_ref, 0, kj, bkp=bkp_q, kp=kp_q, group=group_q,
                          dtype=dt)
        acc_scr[:, :bn_q] = acc

        @pl.when(kj == ks_q - 1)
        def _():
            qkv_ref[:, pl.dslice(c * bn_q, bn_q)] = acc_scr[:, :bn_q].astype(
                qkv_ref.dtype)

    @pl.when(step == Sd + nc_q * ks_q - 1)
    def _():
        hout_ref[:] = h_scr[:, :d].astype(hout_ref.dtype)


def _clamped_chunk_map(phase_start, ks, nc):
    """index pieces for a phase weight: (chunk, kstep) clamped outside the phase
    (parked index -> Pallas skips the re-fetch)."""

    def pieces(step):
        t = jnp.clip(step - phase_start, 0, nc * ks - 1)
        return t // ks, t % ks

    return pieces


@functools.partial(jax.jit, static_argnames=("eps",))
def w4_suffix_a(attn2d, h_res, ln2_w, o_p, gu_p, layer, eps: float = 1e-6):
    """(attn_out, h) -> (act [m, F], h [m, D]): o-proj + residual + rms + gate|up
    + silu*mul in ONE pallas_call. o_p / gu_p: stacked w4 dicts."""
    m, k_o = attn2d.shape
    d = h_res.shape[1]
    L, kp_g, n_gu = gu_p["w_p"].shape
    f = n_gu // 2
    assert m <= 8, m
    m_pad = 8
    if m != m_pad:
        attn2d = jnp.pad(attn2d, ((0, m_pad - m), (0, 0)))
        h_res = jnp.pad(h_res, ((0, m_pad - m), (0, 0)))
    geo_o = _geom(k_o, d, o_p["gscale"].shape[1])
    geo_g = _geom(d, n_gu, gu_p["gscale"].shape[1])
    _, _, _, bn_o, ks_o, nc_o = geo_o
    _, _, _, bn_g, ks_g, nc_g = geo_g
    So, Sg = nc_o * ks_o, nc_g * ks_g
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    o_pieces = _clamped_chunk_map(0, ks_o, nc_o)
    g_pieces = _clamped_chunk_map(So, ks_g, nc_g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(So + Sg,),
        in_specs=[
            pl.BlockSpec((m_pad, k_o), lambda s, lr: (0, 0)),
            pl.BlockSpec((m_pad, d), lambda s, lr: (0, 0)),
            pl.BlockSpec((1, d), lambda s, lr: (0, 0)),
            pl.BlockSpec((1, geo_o[2], bn_o),
                         lambda s, lr: (lr[0], o_pieces(s)[1], o_pieces(s)[0])),
            pl.BlockSpec((1, o_p["gscale"].shape[1], bn_o),
                         lambda s, lr: (lr[0], 0, o_pieces(s)[0])),
            pl.BlockSpec((1, geo_g[2], bn_g),
                         lambda s, lr: (lr[0], g_pieces(s)[1], g_pieces(s)[0])),
            pl.BlockSpec((1, gu_p["gscale"].shape[1], bn_g),
                         lambda s, lr: (lr[0], 0, g_pieces(s)[0])),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, f), lambda s, lr: (0, 0)),
            pl.BlockSpec((m_pad, d), lambda s, lr: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, d), jnp.float32),              # h
            pltpu.VMEM((m_pad, d + n_gu), jnp.float32),       # hn | gu chunks
            pltpu.VMEM((m_pad, max(bn_o, bn_g)), jnp.float32),  # phase acc
        ],
    )
    act, h_out = pl.pallas_call(
        functools.partial(_suffix_a_kernel, geo_o=geo_o, geo_g=geo_g, d=d, f=f,
                          eps=eps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad, f), attn2d.dtype),
                   jax.ShapeDtypeStruct((m_pad, d), attn2d.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(layer_arr, attn2d, h_res, ln2_w[None, :].astype(jnp.float32),
      o_p["w_p"], o_p["gscale"], gu_p["w_p"], gu_p["gscale"])
    return act[:m], h_out[:m]


@functools.partial(jax.jit, static_argnames=("eps",))
def w4_suffix_b(act, h, ln1_next, down_p, qkv_p, layer, next_layer,
                eps: float = 1e-6):
    """(act, h) -> (h2 [m, D], qkv_next [m, Nqkv]): down-proj + residual +
    next-layer input norm + next-layer qkv in ONE pallas_call. The caller adds
    the qkv bias (XLA elementwise) and discards qkv_next for the last layer."""
    m, f = act.shape
    d = h.shape[1]
    n_qkv = qkv_p["w_p"].shape[2]
    assert m <= 8, m
    m_pad = 8
    if m != m_pad:
        act = jnp.pad(act, ((0, m_pad - m), (0, 0)))
        h = jnp.pad(h, ((0, m_pad - m), (0, 0)))
    geo_d = _geom(f, d, down_p["gscale"].shape[1])
    geo_q = _geom(d, n_qkv, qkv_p["gscale"].shape[1])
    _, _, _, bn_d, ks_d, nc_d = geo_d
    _, _, _, bn_q, ks_q, nc_q = geo_q
    Sd, Sq = nc_d * ks_d, nc_q * ks_q
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    nxt_arr = jnp.reshape(next_layer, (1,)).astype(jnp.int32)

    d_pieces = _clamped_chunk_map(0, ks_d, nc_d)
    q_pieces = _clamped_chunk_map(Sd, ks_q, nc_q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Sd + Sq,),
        in_specs=[
            pl.BlockSpec((m_pad, f), lambda s, lr, nr: (0, 0)),
            pl.BlockSpec((m_pad, d), lambda s, lr, nr: (0, 0)),
            pl.BlockSpec((1, d), lambda s, lr, nr: (0, 0)),
            pl.BlockSpec((1, geo_d[2], bn_d),
                         lambda s, lr, nr: (lr[0], d_pieces(s)[1], d_pieces(s)[0])),
            pl.BlockSpec((1, down_p["gscale"].shape[1], bn_d),
                         lambda s, lr, nr: (lr[0], 0, d_pieces(s)[0])),
            pl.BlockSpec((1, geo_q[2], bn_q),
                         lambda s, lr, nr: (nr[0], q_pieces(s)[1], q_pieces(s)[0])),
            pl.BlockSpec((1, qkv_p["gscale"].shape[1], bn_q),
                         lambda s, lr, nr: (nr[0], 0, q_pieces(s)[0])),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, d), lambda s, lr, nr: (0, 0)),
            pl.BlockSpec((m_pad, n_qkv), lambda s, lr, nr: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad, 2 * d), jnp.float32),            # h2 | hn_next
            pltpu.VMEM((m_pad, max(bn_d, bn_q)), jnp.float32),  # phase acc
        ],
    )
    h2, qkv = pl.pallas_call(
        functools.partial(_suffix_b_kernel, geo_d=geo_d, geo_q=geo_q, d=d,
                          n_qkv=n_qkv, eps=eps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad, d), act.dtype),
                   jax.ShapeDtypeStruct((m_pad, n_qkv), act.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(layer_arr, nxt_arr, act, h, ln1_next[None, :].astype(jnp.float32),
      down_p["w_p"], down_p["gscale"], qkv_p["w_p"], qkv_p["gscale"])
    return h2[:m], qkv[:m]


def suffix_supported(stacked: dict, cfg) -> bool:
    """The 2-call path needs the full fused stacked set and kernel-friendly
    geometry (lane-aligned halves for every matmul's dynamic x slicing)."""
    if stacked is None or not all(k in stacked for k in ("qkv", "o")):
        return False
    if "mlp" not in stacked or not all(k in stacked["mlp"] for k in
                                       ("gateup", "down")):
        return False
    d = cfg.hidden_size
    f = cfg.intermediate_size
    k_o = cfg.num_heads * cfg.resolved_head_dim()
    for k in (d, f, k_o):
        if (k // 2) % 128 != 0:
            return False
    return True
