"""Pallas w8a16 matmul: bf16 activations x int8 weights with per-column scales.

Decode-path kernel (SURVEY.md §6 decode north star): the weight matrix streams HBM->VMEM
as int8 (half the bytes of bf16), dequantizes in VMEM, and rides the MXU. Grid tiles
(n, k) with an fp32 VMEM accumulator; output written on the last k step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas compiled mode needs a TPU; interpret transparently on CPU (tests/fallback)."""
    import jax

    return jax.default_backend() == "cpu"



def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, k_steps: int):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                   # [m, bk] bf16
    w = w_ref[:].astype(jnp.bfloat16)              # [bk, bn] int8 -> bf16 in VMEM
    acc_ref[:] += jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(kj == k_steps - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def w8a16_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                 block_n: int = 512, block_k: int = 1024) -> jnp.ndarray:
    """x [m, K] bf16/f32, w_q [K, N] int8, scale [N] f32 -> [m, N] in x.dtype.

    m is padded to the sublane tile; K, N must divide by the (clamped) blocks.
    """
    m, k = x.shape
    _, n = w_q.shape
    bn = min(block_n, n)
    bk = min(block_k, k)
    assert k % bk == 0 and n % bn == 0, (k, bk, n, bn)

    m_pad = -(-m // 8) * 8
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, k_steps=k // bk),
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((m_pad, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(x, w_q, scale[None, :])
    return out[:m]
