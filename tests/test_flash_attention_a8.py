"""Int8-QK flash attention: tolerance-band tests vs the f32 XLA reference.

Unlike flash_attention (parity-critical), the a8 kernel is a quantized approximation
(ops/pallas/flash_attention_a8.py docstring): per-row Q scales, per-(head, super-tile)
smoothed K scales, bf16 PV. Error model: the score error is ~0.012 nats std
(q-step/sqrt(12) + k-step/sqrt(12) over d=128), so softmax weights move ~1% and the
output error is ~1% OF THE VALUE SCALE. On iid-random inputs the output itself is an
average of ~T values (rms ~ sigma_v/sqrt(T_eff)), so error-relative-to-output looks
inflated by sqrt(T_eff); the gates below use the value scale, matching how the error
propagates through the residual stream. Shipping accuracy evidence is the on-chip
logit-divergence delta in bench_ttft (BENCH_r04).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops.attention import causal_mask, gqa_attention
from audio_flamingo_tpu.ops.pallas.flash_attention_a8 import flash_attention_a8

jax.config.update("jax_default_matmul_precision", "highest")


def _ref(q, k, v, causal, scale=None, q_offset=0):
    mask = causal_mask(q.shape[1], k.shape[1], q_offset=q_offset) if causal else None
    return gqa_attention(q, k, v, mask=mask, scale=scale)


def _v_band(v, out, ref):
    """Max abs error relative to the VALUE rms (the scale attention outputs live on)."""
    denom = float(jnp.sqrt(jnp.mean(v.astype(jnp.float32) ** 2))) + 1e-9
    return float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()) / denom


@pytest.mark.parametrize("tq,tk,h,hkv,d,causal", [
    (256, 256, 4, 2, 128, True),     # GQA causal (LM prefill shape family)
    (384, 384, 4, 4, 64, False),     # MHA non-causal (encoder shape family)
    (200, 200, 4, 2, 128, True),     # unaligned lengths -> padding + kv_len mask
])
def test_a8_close_to_reference(tq, tk, h, hkv, d, causal):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, tq, h, d)), jnp.float32)
    # common-mode K bias: the smoothing must absorb it (softmax-invariant shift)
    k = jnp.asarray(rng.normal(size=(2, tk, hkv, d)) + 0.5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, tk, hkv, d)), jnp.float32)
    out = flash_attention_a8(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = _ref(q, k, v, causal)
    assert _v_band(v, out, ref) < 0.04


def test_a8_smoothing_absorbs_common_mode():
    """A LARGE common-mode K component (|bias| >> signal) must not eat the int8
    range: with smoothing the error band is the same as without the bias."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 256, 4, 128)), jnp.float32)
    kz = rng.normal(size=(1, 256, 2, 128)).astype(np.float32)
    bias = 8.0 * rng.normal(size=(1, 1, 2, 128)).astype(np.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 128)), jnp.float32)
    out_b = flash_attention_a8(q, jnp.asarray(kz + bias), v, causal=True,
                               block_q=128, block_k=128)
    ref_b = _ref(q, jnp.asarray(kz + bias), v, True)
    assert _v_band(v, out_b, ref_b) < 0.04
    # without smoothing this bias would consume ~8x of the int8 range; sanity-check
    # the unbiased case sits in the same band (the shift really is absorbed)
    out_z = flash_attention_a8(q, jnp.asarray(kz), v, causal=True,
                               block_q=128, block_k=128)
    ref_z = _ref(q, jnp.asarray(kz), v, True)
    assert abs(_v_band(v, out_b, ref_b) - _v_band(v, out_z, ref_z)) < 0.02


def test_a8_outlier_rows_survive_per_row_scales():
    """A few huge-magnitude Q rows must not destroy OTHER rows' accuracy: per-row
    scales isolate them. The outlier rows themselves have huge score MAGNITUDES, so
    their ~1% relative score error is large in nats and near-tie argmaxes can flip —
    the documented int8-QK trade (kernel docstring); those rows are excluded."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 256, 4, 128)).astype(np.float32)
    q[0, 7] *= 50.0
    q[0, 130] *= 50.0
    q = jnp.asarray(q)
    k = jnp.asarray(rng.normal(size=(1, 256, 2, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 128)), jnp.float32)
    out = flash_attention_a8(q, k, v, causal=True, block_q=128, block_k=128)
    ref = _ref(q, k, v, True)
    keep = np.setdiff1d(np.arange(256), [7, 130])
    assert _v_band(v, out[:, keep], ref[:, keep]) < 0.04


def test_a8_q_offset_decode_block():
    """q_offset semantics match the parity kernel (verify-block geometry)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 128, 4, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 384, 2, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 384, 2, 128)), jnp.float32)
    out = flash_attention_a8(q, k, v, causal=True, q_offset=256,
                             block_q=128, block_k=128)
    ref = _ref(q, k, v, True, q_offset=256)
    assert _v_band(v, out, ref) < 0.02


def test_a8_peaky_attention_is_tight():
    """With REAL-model-like peaky attention (scores spread over many nats) the
    output follows the argmax rows closely — the regime where quantized scores
    could flip winners. Gate the absolute error directly."""
    rng = np.random.default_rng(4)
    # score std ~2.25 nats — the few-nat top-candidate spread of trained attention
    q = jnp.asarray(1.5 * rng.normal(size=(1, 256, 4, 128)), jnp.float32)
    k = jnp.asarray(1.5 * rng.normal(size=(1, 256, 2, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 128)), jnp.float32)
    out = flash_attention_a8(q, k, v, causal=True, block_q=128, block_k=128)
    ref = _ref(q, k, v, True)
    # the score error is RELATIVE (~1.2% of score std, i.e. ~0.03 nats here), so
    # softmax weights shift a few percent; rows whose top-2 gap is under the error
    # can flip (documented trade). Gate the distribution, not the max.
    err = jnp.abs(out - ref).max(axis=(-1, -2))[0]
    assert float(jnp.median(err)) < 0.05
    assert float(jnp.quantile(err, 0.9)) < 0.10
