"""Pallas w4a16 matmul: bf16 activations x nibble-packed int4 weights, group scales.

The decode-path companion of ops/pallas/quant_matmul.py one tier lower: the weight
matrix streams HBM->VMEM as PACKED int4 (a quarter of bf16's bytes, half of int8's),
unpacks with two arithmetic shifts on the VPU, and rides the MXU per group so the
group scale can be applied to the f32 partial product AFTER the dot (exact — no
bf16 dequant rounding on the weights; integer values -7..7 are bf16-exact).

Packing is the "halves" layout of ops/quant4.py: packed row i holds full-matrix row i
in its low nibble and row i + K/2 in its high nibble, so the kernel runs two dots per
group (x's low half against low nibbles, high half against high nibbles) and never
interleaves rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas compiled mode needs a TPU; interpret transparently on CPU (tests)."""
    return jax.default_backend() == "cpu"


def _kernel(xlo_ref, xhi_ref, wp_ref, slo_ref, shi_ref, o_ref, acc_ref,
            *, k_steps: int, group: int):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[:].astype(jnp.int32)                    # [bkp, bn] packed
    lo = ((w << 28) >> 28).astype(xlo_ref.dtype)       # sign-extended low nibble
    hi = ((w << 24) >> 28).astype(xlo_ref.dtype)       # sign-extended high nibble
    bkp = lo.shape[0]
    # scale refs hold the FULL [Kp/G, bn] column strip (a Mosaic-tile-aligned block
    # of only this step's rows would have a sublane dim < 8); rows are indexed
    # dynamically off the k-step
    base = kj * (bkp // group)
    for g in range(bkp // group):                      # static unroll (<= 4 groups)
        sl = slice(g * group, (g + 1) * group)
        ylo = jax.lax.dot_general(xlo_ref[:, sl], lo[sl, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        yhi = jax.lax.dot_general(xhi_ref[:, sl], hi[sl, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc_ref[:] += (ylo * slo_ref[pl.dslice(base + g, 1), :].astype(jnp.float32)
                       + yhi * shi_ref[pl.dslice(base + g, 1), :].astype(jnp.float32))

    @pl.when(kj == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _stacked_kernel(layer_ref, xlo_ref, xhi_ref, wp_ref, s_ref, o_ref, acc_ref,
                    *, k_steps: int, group: int, kp_groups: int):
    """Layer-stacked variant: weight/scale blocks are indexed by the prefetched
    layer id in their BlockSpec index maps (same mechanism as the paged-attention
    kernel's page gather), so a lax.scan over layers streams straight from the
    stacked HBM arrays — no per-layer slice materialization."""
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[0].astype(jnp.int32)                    # [bkp, bn] packed
    lo = ((w << 28) >> 28).astype(xlo_ref.dtype)
    hi = ((w << 24) >> 28).astype(xlo_ref.dtype)
    bkp = lo.shape[0]
    base = kj * (bkp // group)
    for g in range(bkp // group):
        sl = slice(g * group, (g + 1) * group)
        ylo = jax.lax.dot_general(xlo_ref[:, sl], lo[sl, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        yhi = jax.lax.dot_general(xhi_ref[:, sl], hi[sl, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc_ref[:] += (
            ylo * s_ref[0, pl.dslice(base + g, 1), :].astype(jnp.float32)
            + yhi * s_ref[0, pl.dslice(kp_groups + base + g, 1), :]
            .astype(jnp.float32))

    @pl.when(kj == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "max_groups"))
def w4a16_matmul_stacked(x: jnp.ndarray, w_p: jnp.ndarray, gscale: jnp.ndarray,
                         layer: jnp.ndarray, block_n: int = 1 << 30,
                         max_groups: int = 4) -> jnp.ndarray:
    """x [m, K] @ layer `layer` of stacked w_p [L, K/2, N] / gscale [L, K/G, N].

    The decode-path form: called from inside a lax.scan over layers with the
    loop index as `layer`. block_n defaults to FULL N — at decode m the whole
    matmul is one pure-K grid stream, minimizing the ~27 us fixed cost per
    pallas_call measured on this backend (scripts/profile_w4e.py).
    """
    m, k = x.shape
    n_layers, kp, n = w_p.shape
    assert k == 2 * kp, (k, kp)
    n_groups = gscale.shape[1]
    group = k // n_groups
    kp_groups = kp // group
    bkp = _pick_bkp(kp_groups, group, max_groups)
    bn = min(block_n, n)
    # scoped VMEM is 16 MB on v5e: double-buffered weight blocks + f32 scale
    # strips + the f32 accumulator must fit, so cap the weight block at ~2.5 MB
    # (a 4.85 MB gateup block measured 17.16M scoped and failed to compile)
    while bkp * bn > (5 << 19) and bn % 2 == 0 and (bn // 2) % 128 == 0:
        bn //= 2
    assert n % bn == 0, (n, bn)

    m_pad = -(-m // 8) * 8
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    x_lo, x_hi = x[:, :kp], x[:, kp:]
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    k_steps = kp // bkp
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((m_pad, bkp), lambda i, j, lr: (0, j)),
            pl.BlockSpec((m_pad, bkp), lambda i, j, lr: (0, j)),
            pl.BlockSpec((1, bkp, bn), lambda i, j, lr: (lr[0], j, i)),
            pl.BlockSpec((1, n_groups, bn), lambda i, j, lr: (lr[0], 0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j, lr: (0, i)),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_stacked_kernel, k_steps=k_steps, group=group,
                          kp_groups=kp_groups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(layer_arr, x_lo, x_hi, w_p, gscale)
    return out[:m]


def _pick_bkp(kp_groups: int, group: int, max_groups: int = 4) -> int:
    """Largest c <= max_groups dividing the group count -> bkp = c * group
    (amortizes grid overhead without breaking block divisibility)."""
    for c in range(max_groups, 0, -1):
        if kp_groups % c == 0:
            return c * group
    return group


@functools.partial(jax.jit, static_argnames=("block_n", "max_groups"))
def w4a16_matmul(x: jnp.ndarray, w_p: jnp.ndarray, gscale: jnp.ndarray,
                 block_n: int = 1 << 30, max_groups: int = 4) -> jnp.ndarray:
    """x [m, K] bf16/f32, w_p [K/2, N] packed int8, gscale [K/G, N] f32 -> [m, N].

    K/2 must divide into whole groups (ops/quant4.supports_w4); N must divide by
    the clamped block_n. m is padded to the sublane tile. block_n defaults to
    full N (one pure-K grid stream per call — the ~27 us fixed pallas_call cost
    dominates at small blocks; scripts/profile_w4e.py), VMEM-shrunk like the
    stacked variant.
    """
    m, k = x.shape
    kp, n = w_p.shape
    assert k == 2 * kp, (k, kp)
    n_groups = gscale.shape[0]
    assert k % n_groups == 0 and (k // n_groups) % 2 == 0, (k, n_groups)
    group = k // n_groups
    kp_groups = kp // group
    assert kp_groups * group == kp, (kp, group)
    bkp = _pick_bkp(kp_groups, group, max_groups)
    bn = min(block_n, n)
    while bkp * bn > (5 << 19) and bn % 2 == 0 and (bn // 2) % 128 == 0:
        bn //= 2
    assert n % bn == 0, (n, bn)

    m_pad = -(-m // 8) * 8
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    x_lo, x_hi = x[:, :kp], x[:, kp:]
    s_lo, s_hi = gscale[:kp_groups], gscale[kp_groups:]

    k_steps = kp // bkp
    out = pl.pallas_call(
        functools.partial(_kernel, k_steps=k_steps, group=group),
        grid=(n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((m_pad, bkp), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, bkp), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp_groups, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp_groups, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(x_lo, x_hi, w_p, s_lo, s_hi)
    return out[:m]
