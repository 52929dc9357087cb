"""Fused quant-epilogue encoder-layer kernels (w8a8, VERDICT r3 Next #1).

Why: the XLA-composed a8 encoder path (ops/quant.q_matmul_a8 inside
models/whisper_encoder._layer_forward) runs at ~21% of the v5e's int8 peak —
the int8 matmul floor for the 32-layer / 20-window / d=1280 encoder is ~98 ms
but the measured wall is ~466 ms (scripts/profile_ttft.py). The gap is NOT the
MXU: every LayerNorm, dynamic activation quantization (row max -> scale ->
round), f32 dequant epilogue and exact GELU is a separate XLA pass that
round-trips the [30720, d] (and worse, the [30720, ffn] f32) activations
through HBM. At ~800 GB/s that glue is several ms per layer against a ~3 ms
matmul floor.

These kernels keep the whole layer's elementwise work in VMEM:

- `enc_ln_qkv`:   x -> LayerNorm -> int8 quant -> fused q|k|v int8 matmul
                  (+ dequant + bias, q pre-scale folded into scales/bias by the
                  caller) -> bf16. One read of x, one write of q|k|v.
- `enc_out_ln`:   attn -> int8 quant -> o-proj int8 matmul -> + bias + residual
                  -> emits x2 AND the quantized LayerNorm(x2) for the MLP.
- `enc_mlp`:      h_q -> fc1 int8 matmul -> + bias -> exact GELU -> re-quant
                  (per ffn tile) -> fc2 int8 matmul -> + bias + residual -> bf16.
                  The [rows, ffn] GELU activations NEVER exist in HBM: fc1
                  output tiles are consumed by fc2 immediately in VMEM.

Weights stay VMEM-resident across the row grid (constant BlockSpec index maps:
Pallas skips the copy when a block index repeats), so per-layer weight traffic
is one sweep (~20 MB), not per-row-block.

Numerics: LayerNorm in f32 (matches ops.layer_norm); activation quantization is
the ops/quant.quantize_act recipe (per-row dynamic absmax/127). The MLP's
re-quantization is per (row, ffn-tile) — strictly finer than the XLA path's
per-row scale, so its band is at or below the existing a8 tolerance
(tests/test_enc_fused.py gates both kernel==emulation exactness and the
fused==XLA-a8 band).

Reference behavior: [hf] models/whisper/modeling_whisper.py:372-433 (pre-norm
encoder layer); this is a performance-path reimplementation of that layer's
linears under w8a8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_flamingo_tpu.ops.pallas.quant_matmul import _interpret


def _quant_rows(h: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 [m, d] -> (int8 [m, d], f32 scale [m, 1]); ops/quant.quantize_act math."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def _ln(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    """f32 LayerNorm over the last axis (ops/norms.layer_norm math)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU via polynomial erf (Mosaic has no erf primitive).

    Abramowitz & Stegun 7.1.26 rational approximation: |erf_poly - erf| <=
    1.5e-7 absolute — three orders of magnitude below the int8 quantization
    step this kernel applies right after, so the fused path's band vs the XLA
    a8 path is unchanged (tests/test_enc_fused.py)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    u = x * 0.7071067811865476
    s = jnp.sign(u)
    z = jnp.abs(u)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf = s * (1.0 - poly * jnp.exp(-z * z))
    return 0.5 * x * (1.0 + erf)


def _i8_dot(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 MXU dot, f32 result."""
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32).astype(jnp.float32)


# --------------------------------------------------------------- ln + qkv

def _ln_qkv_kernel(x_ref, lnw_ref, lnb_ref, w_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    h = _ln(x, lnw_ref[:].astype(jnp.float32), lnb_ref[:].astype(jnp.float32), eps)
    hq, hs = _quant_rows(h)
    y = _i8_dot(hq, w_ref[:]) * hs * s_ref[:].astype(jnp.float32)
    o_ref[:] = (y + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_m"))
def enc_ln_qkv(x: jnp.ndarray, ln_w: jnp.ndarray, ln_b: jnp.ndarray,
               w_q: jnp.ndarray, w_scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5, block_m: int = 128) -> jnp.ndarray:
    """x [m, d] bf16 -> LayerNorm -> quant -> x @ w_q [d, N] int8 -> bf16 [m, N].

    N is q|k|v concatenated; the caller folds the reference's q pre-scale
    (head_dim**-0.5) into w_scale/bias for the q columns."""
    m, d = x.shape
    n = w_q.shape[1]
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x, ln_w[None, :], ln_b[None, :], w_q, w_scale[None, :], bias[None, :])
    return out[:m]


# ------------------------------------------------- o-proj + residual + ln + quant

def _out_ln_kernel(attn_ref, x_ref, w_ref, s_ref, b_ref, lnw_ref, lnb_ref,
                   x2_ref, hq_ref, hs_ref, *, eps):
    a = attn_ref[:].astype(jnp.float32)
    aq, ascale = _quant_rows(a)
    y = _i8_dot(aq, w_ref[:]) * ascale * s_ref[:].astype(jnp.float32)
    x2 = x_ref[:].astype(jnp.float32) + y + b_ref[:].astype(jnp.float32)
    x2_ref[:] = x2.astype(x2_ref.dtype)
    h = _ln(x2, lnw_ref[:].astype(jnp.float32), lnb_ref[:].astype(jnp.float32), eps)
    hq, hs = _quant_rows(h)
    hq_ref[:] = hq
    hs_ref[:] = hs


@functools.partial(jax.jit, static_argnames=("eps", "block_m"))
def enc_out_ln(attn: jnp.ndarray, x: jnp.ndarray, w_q: jnp.ndarray,
               w_scale: jnp.ndarray, bias: jnp.ndarray,
               ln_w: jnp.ndarray, ln_b: jnp.ndarray,
               eps: float = 1e-5, block_m: int = 128):
    """attn, x [m, d] -> (x2 = x + attn @ w_o + b, int8 quant of LayerNorm(x2)).

    Returns (x2 bf16 [m, d], h_q int8 [m, d], h_scale f32 [m, 1])."""
    m, d = attn.shape
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        attn = jnp.pad(attn, ((0, m_pad - m), (0, 0)))
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    x2, hq, hs = pl.pallas_call(
        functools.partial(_out_ln_kernel, eps=eps),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, d), attn.dtype),
            jax.ShapeDtypeStruct((m_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(attn, x, w_q, w_scale[None, :], bias[None, :], ln_w[None, :], ln_b[None, :])
    return x2[:m], hq[:m], hs[:m]


# ---------------------------------------------------------------- fused MLP

# shipping block geometry for the whisper-large MLP shape (d=1280, f=5120):
# both weight matrices stay VMEM-resident (13 MB), so the row block must keep
# the scoped-VMEM total under the 16 MB limit — (128, 2560) measured fastest
# standalone but exceeds the limit by 104 KB inside the layer scan
ENC_MLP_BLOCK_M = 112
ENC_MLP_F_TILE = 2560


def _mlp_kernel(hq_ref, hs_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                x2_ref, o_ref, *, f_tiles: int, ft: int):
    hq = hq_ref[:]
    hs = hs_ref[:]
    acc = jnp.zeros((hq.shape[0], o_ref.shape[1]), jnp.float32)
    for j in range(f_tiles):
        sl = slice(j * ft, (j + 1) * ft)
        g = _i8_dot(hq, w1_ref[:, sl]) * hs * s1_ref[:, sl].astype(jnp.float32) \
            + b1_ref[:, sl].astype(jnp.float32)
        g = _gelu(g)
        gq, gs = _quant_rows(g)
        acc = acc + _i8_dot(gq, w2_ref[sl, :]) * gs
    y = acc * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (x2_ref[:].astype(jnp.float32) + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "f_tile"))
def enc_mlp(h_q: jnp.ndarray, h_scale: jnp.ndarray,
            w1_q: jnp.ndarray, w1_scale: jnp.ndarray, b1: jnp.ndarray,
            w2_q: jnp.ndarray, w2_scale: jnp.ndarray, b2: jnp.ndarray,
            x2: jnp.ndarray, block_m: int = 128, f_tile: int = 2560) -> jnp.ndarray:
    """Fused w8a8 MLP: x2 + fc2(quant(gelu(fc1(h_q)))) without HBM'ing the
    [m, ffn] activations.

    h_q int8 [m, d] + h_scale f32 [m, 1] (from enc_out_ln); w1_q [d, f] int8,
    w2_q [f, d] int8 with per-column f32 scales; GELU is exact (erf), matching
    the reference encoder. Re-quantization is per (row, f_tile)."""
    m, d = h_q.shape
    f = w1_q.shape[1]
    ft = min(f_tile, f)
    assert f % ft == 0, (f, ft)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        h_q = jnp.pad(h_q, ((0, m_pad - m), (0, 0)))
        h_scale = jnp.pad(h_scale, ((0, m_pad - m), (0, 0)), constant_values=1.0)
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, f_tiles=f // ft, ft=ft),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(h_q, h_scale, w1_q, w1_scale[None, :], b1[None, :],
      w2_q, w2_scale[None, :], b2[None, :], x2)
    return out[:m]
