"""Experimental w4 kernel variant used by profile_w4b.py: int8-native nibble
unpack (no int32 round trip), block_n / max_groups tunable."""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def _kernel_i8(xlo_ref, xhi_ref, wp_ref, slo_ref, shi_ref, o_ref, acc_ref,
               *, k_steps: int, group: int):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[:]                                       # int8 [bkp, bn]
    lo = (jnp.int8(w << 4) >> 4).astype(xlo_ref.dtype)  # int8 shifts, no i32
    hi = (w >> 4).astype(xlo_ref.dtype)
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
        acc_ref[:] += (ylo * slo_ref[pl.dslice(base + g, 1), :].astype(jnp.float32)
                       + yhi * shi_ref[pl.dslice(base + g, 1), :].astype(jnp.float32))

    @pl.when(kj == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "max_groups"))
def w4_i8unpack(x, w_p, gscale, block_n: int = 512, max_groups: int = 4):
    from audio_flamingo_tpu.ops.pallas.quant4_matmul import _pick_bkp

    m, k = x.shape
    kp, n = w_p.shape
    group = k // gscale.shape[0]
    kp_groups = kp // group
    bn = min(block_n, n)
    bkp = _pick_bkp(kp_groups, group, max_groups)
    m_pad = -(-m // 8) * 8
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    x_lo, x_hi = x[:, :kp], x[:, kp:]
    s_lo, s_hi = gscale[:kp_groups], gscale[kp_groups:]
    k_steps = kp // bkp
    out = pl.pallas_call(
        functools.partial(_kernel_i8, k_steps=k_steps, group=group),
        grid=(n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((m_pad, bkp), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, bkp), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp_groups, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp_groups, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x_lo, x_hi, w_p, s_lo, s_hi)
    return out[:m]
