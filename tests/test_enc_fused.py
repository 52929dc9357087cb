"""Fused quant-epilogue encoder kernels (ops/pallas/enc_fused.py): interpret-mode
kernel==emulation exactness, fused layer == XLA-a8 layer band, full encoder band
vs bf16 dense (mirrors the existing a8 tolerance tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import WhisperEncoderConfig
from audio_flamingo_tpu.models import whisper_encoder
from audio_flamingo_tpu.ops.pallas.enc_fused import (_gelu, _ln, _quant_rows, enc_ln_qkv,
                                                     enc_mlp, enc_out_ln)
from audio_flamingo_tpu.ops.quant import (quantize_encoder_params,
                                          quantize_encoder_params_fused)

jax.config.update("jax_default_matmul_precision", "highest")

D, F, NH = 64, 128, 4
HD = D // NH


def _rand(rng, *shape, s=0.5):
    return jnp.asarray(rng.normal(size=shape) * s, jnp.float32)


def _qw(rng, a, b):
    w = rng.normal(size=(a, b)) * 0.3
    amax = np.maximum(np.abs(w).max(axis=0), 1e-8)
    scale = amax / 127.0
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(w_q), jnp.asarray(scale, jnp.float32)


def _assert_ulp_equal(got, want):
    """Kernel == emulation up to quantization knife edges: when an activation
    element sits exactly on an int8 rounding boundary, per-block vs full-array
    compilation can flip its rounded value by 1, shifting that whole row by one
    quantization step (~1/127 of the row scale). Everything else is bit-equal
    (the int8 dots are exact integers). Gate: >=97% bit-equal, remainder within
    the one-step band."""
    a = np.asarray(got, np.float32)
    b = np.asarray(want, np.float32)
    assert (a == b).mean() > 0.97, (a == b).mean()
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-2)


def _i8dot(a, w):
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32).astype(jnp.float32)


def test_ln_qkv_matches_emulation():
    rng = np.random.default_rng(0)
    m = 200  # not a block multiple: exercises row padding
    x = _rand(rng, m, D).astype(jnp.bfloat16)
    lnw, lnb = _rand(rng, D, s=0.2) + 1.0, _rand(rng, D, s=0.1)
    w_q, scale = _qw(rng, D, 3 * D)
    bias = _rand(rng, 3 * D, s=0.05)

    got = enc_ln_qkv(x, lnw, lnb, w_q, scale, bias, block_m=64)

    h = _ln(x.astype(jnp.float32), lnw, lnb, 1e-5)
    hq, hs = _quant_rows(h)
    want = (_i8dot(hq, w_q) * hs * scale[None] + bias[None]).astype(jnp.bfloat16)
    _assert_ulp_equal(got, want)


def test_out_ln_matches_emulation():
    rng = np.random.default_rng(1)
    m = 130
    attn = _rand(rng, m, D).astype(jnp.bfloat16)
    x = _rand(rng, m, D).astype(jnp.bfloat16)
    w_q, scale = _qw(rng, D, D)
    bias = _rand(rng, D, s=0.05)
    lnw, lnb = _rand(rng, D, s=0.2) + 1.0, _rand(rng, D, s=0.1)

    x2, hq, hs = enc_out_ln(attn, x, w_q, scale, bias, lnw, lnb, block_m=64)

    aq, ascale = _quant_rows(attn.astype(jnp.float32))
    x2_want = (x.astype(jnp.float32) + _i8dot(aq, w_q) * ascale * scale[None]
               + bias[None]).astype(jnp.bfloat16)
    h = _ln(x2_want.astype(jnp.float32), lnw, lnb, 1e-5)
    hq_want, hs_want = _quant_rows(h)
    _assert_ulp_equal(x2, x2_want)
    # quantization of a bf16-rounded x2: the kernel quantizes its own f32 x2
    # (pre-rounding), so compare through the same pre-rounding emulation
    x2_f = (x.astype(jnp.float32) + _i8dot(aq, w_q) * ascale * scale[None]
            + bias[None])
    hq_want2, hs_want2 = _quant_rows(_ln(x2_f, lnw, lnb, 1e-5))
    assert (np.asarray(hq) == np.asarray(hq_want2)).mean() > 0.97
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_want2), rtol=2e-2)


def test_mlp_matches_emulation():
    rng = np.random.default_rng(2)
    m = 96
    h = _rand(rng, m, D)
    hq, hs = _quant_rows(h)
    w1, s1 = _qw(rng, D, F)
    b1 = _rand(rng, F, s=0.05)
    w2, s2 = _qw(rng, F, D)
    b2 = _rand(rng, D, s=0.05)
    x2 = _rand(rng, m, D).astype(jnp.bfloat16)

    ft = F // 2
    got = enc_mlp(hq, hs, w1, s1, b1, w2, s2, b2, x2, block_m=32, f_tile=ft)

    acc = jnp.zeros((m, D), jnp.float32)
    for j in range(F // ft):
        sl = slice(j * ft, (j + 1) * ft)
        g = _i8dot(hq, w1[:, sl]) * hs * s1[None, sl] + b1[None, sl]
        g = _gelu(g)
        gq, gs = _quant_rows(g)
        acc = acc + _i8dot(gq, w2[sl, :]) * gs
    want = (x2.astype(jnp.float32) + acc * s2[None] + b2[None]).astype(jnp.bfloat16)
    _assert_ulp_equal(got, want)


@pytest.fixture(scope="module")
def enc_setup():
    cfg = WhisperEncoderConfig(num_mel_bins=16, d_model=D, num_layers=2,
                               num_heads=NH, ffn_dim=F, max_source_positions=128)
    params = whisper_encoder.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    mels = jnp.asarray(rng.normal(size=(2, 256, 16)) * 0.3, jnp.float32)
    return cfg, params, mels


def test_fused_encoder_matches_a8_band(enc_setup):
    """Full encoder: fused-kernel path vs the XLA-composed a8 path. The only
    numeric difference is the MLP re-quantization granularity (per f-tile vs
    per row), so outputs agree to a tight band."""
    cfg, params, mels = enc_setup
    p8 = quantize_encoder_params(params)
    pf = quantize_encoder_params_fused(params, head_dim=cfg.head_dim)
    y8 = whisper_encoder.apply(p8, cfg, mels, compute_dtype=jnp.bfloat16)
    yf = whisper_encoder.apply(pf, cfg, mels, compute_dtype=jnp.bfloat16)
    a, b = np.asarray(y8, np.float32), np.asarray(yf, np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    assert rel < 0.05, rel


def test_fused_encoder_matches_dense_band(enc_setup):
    """Fused w8a8 vs bf16 dense: same acceptance band as the XLA a8 path."""
    cfg, params, mels = enc_setup
    pf = quantize_encoder_params_fused(params, head_dim=cfg.head_dim)
    pb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    yd = whisper_encoder.apply(pb, cfg, mels, compute_dtype=jnp.bfloat16)
    yf = whisper_encoder.apply(pf, cfg, mels, compute_dtype=jnp.bfloat16)
    a, b = np.asarray(yd, np.float32), np.asarray(yf, np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    assert (np.abs(a - b) / denom).mean() < 0.05
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos


def test_poly_erf_gelu_accuracy():
    """In-kernel polynomial GELU vs jax.nn.gelu(exact): <=1e-6 absolute over a
    wide range (the A&S 7.1.26 bound), far below the int8 quantization step."""
    x = jnp.linspace(-12.0, 12.0, 20001, dtype=jnp.float32)
    got = np.asarray(_gelu(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.abs(got - want).max() < 2e-6
