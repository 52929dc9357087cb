"""int8 weight-only quantization tests: accuracy, pallas kernel parity, quantized LM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops.quant import dequantize, q_matmul, quantize_linear, quantize_lm_params

jax.config.update("jax_default_matmul_precision", "highest")


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    q = quantize_linear(w)
    deq = dequantize(q, jnp.float32)
    # per-channel int8: relative error ~ 1/127 of the channel max
    rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01


def test_q_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.1, jnp.float32)
    q = quantize_linear(w)
    ref = x @ dequantize(q, jnp.float32)
    out = q_matmul(x, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-2)


def test_pallas_w8a16_matches_xla():
    from unittest import mock
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 512)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(512, 512)) * 0.1, jnp.float32)
    q = quantize_linear(w)
    ref = np.asarray(q_matmul(x, q))

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        from audio_flamingo_tpu.ops.pallas.quant_matmul import w8a16_matmul

        out = np.asarray(w8a16_matmul(x, q["w_q"], q["scale"], block_n=256, block_k=256))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)


def test_quantized_qwen2_logits_close():
    """Quantized LM must stay close to fp32 logits and pick the same greedy tokens."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=2, tie_word_embeddings=False)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_lm_params(params)
    assert qparams["layers"]["q"]["w_q"].dtype == jnp.int8
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 9)))
    ref = qwen2.logits_from_ids(params, cfg, ids)
    out = qwen2.logits_from_ids(qparams, cfg, ids)
    # random-init logits are near-flat, so allow rare argmax flips from quant noise
    agree = (np.asarray(ref.argmax(-1)) == np.asarray(out.argmax(-1))).mean()
    assert agree >= 0.85, agree
    # logits close in a relative sense
    denom = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(out - ref)).max() / denom < 0.05


def test_quantized_cache_decode_consistent():
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=2, tie_word_embeddings=True)
    params = quantize_lm_params(qwen2.init(jax.random.PRNGKey(1), cfg))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (1, 8)))
    full = qwen2.logits_from_ids(params, cfg, ids)
    cache = qwen2.init_cache(cfg, 1, 16, dtype=jnp.float32)
    x = qwen2.embed(params, ids, dtype=jnp.float32)
    h, cache = qwen2.forward(params, cfg, x, jnp.arange(8)[None], cache=cache)
    np.testing.assert_allclose(np.asarray(qwen2.unembed(params, cfg, h)),
                               np.asarray(full), atol=1e-4, rtol=1e-4)


def test_q8_kv_cache_close_to_fp_cache():
    """int8 KV cache: prefill+decode logits stay close to the fp cache path and greedy
    choices mostly agree."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=96, hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=2, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 96, (1, 10)))

    def run(cache):
        x = qwen2.embed(params, ids[:, :6])
        h, cache = qwen2.forward(params, cfg, x, jnp.arange(6)[None], cache=cache)
        outs = [qwen2.unembed(params, cfg, h[:, -1])]
        for t in range(6, 10):
            x = qwen2.embed(params, ids[:, t: t + 1])
            h, cache = qwen2.forward(params, cfg, x, jnp.array([[t]]), cache=cache)
            outs.append(qwen2.unembed(params, cfg, h[:, 0]))
        return jnp.stack(outs, axis=1)

    fp = run(qwen2.init_cache(cfg, 1, 16, dtype=jnp.float32))
    q8 = run(qwen2.init_cache_q8(cfg, 1, 16))
    rel = float(jnp.abs(q8 - fp).max() / (jnp.abs(fp).max() + 1e-6))
    assert rel < 0.05, rel
    agree = (np.asarray(fp.argmax(-1)) == np.asarray(q8.argmax(-1))).mean()
    assert agree >= 0.8, agree


def test_q_matmul_a8_close_to_float():
    """w8a8 dynamic activation quantization: y within the int8 quantization band of
    the exact float product (per-token act scales x per-channel weight scales)."""
    from audio_flamingo_tpu.ops.quant import q_matmul_a8, quantize_linear

    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 96)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(4, 8, 64)).astype(np.float32))
    p = quantize_linear(jnp.asarray(w))
    y = q_matmul_a8(x, p)
    ref = x @ w
    rel = float(jnp.abs(y - ref).max() / (jnp.abs(ref).max() + 1e-6))
    assert rel < 0.03, rel


def test_a8_prefill_logits_close_and_decode_unchanged():
    """cfg.a8_prefill speeds multi-token forwards at a bounded accuracy cost; DECODE
    (s=1) must be bit-identical to the w8a16 path (the knob only touches prefill)."""
    import dataclasses

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.ops.quant import quantize_lm_params

    cfg = Qwen2Config(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      tie_word_embeddings=True)
    params = quantize_lm_params(qwen2.init(jax.random.PRNGKey(3), cfg))
    cfg_a8 = dataclasses.replace(cfg, a8_prefill=True)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 96, (2, 12)))

    base = qwen2.logits_from_ids(params, cfg, ids)
    a8 = qwen2.logits_from_ids(params, cfg_a8, ids)
    rel = float(jnp.abs(a8 - base).max() / (jnp.abs(base).max() + 1e-6))
    assert rel < 0.05, rel
    agree = (np.asarray(base.argmax(-1)) == np.asarray(a8.argmax(-1))).mean()
    assert agree >= 0.8, agree

    # decode path: single-token forwards identical regardless of the knob
    x = qwen2.embed(params, ids[:, :1], dtype=jnp.float32)
    pos = jnp.zeros((2, 1), jnp.int32)
    c1 = qwen2.init_cache(cfg, 2, 8, dtype=jnp.float32)
    c2 = qwen2.init_cache(cfg_a8, 2, 8, dtype=jnp.float32)
    h1, _ = qwen2.forward(params, cfg, x, pos, cache=c1)
    h2, _ = qwen2.forward(params, cfg_a8, x, pos, cache=c2)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_quantize_encoder_params_close():
    """int8 encoder (w8a8 layer linears) stays within a small band of the f32
    tower — the encode-phase half of the TTFT knob (api.load(a8_encoder=True)).
    Conv stems/norms/positions must remain float and untouched."""
    from audio_flamingo_tpu.config import WhisperEncoderConfig
    from audio_flamingo_tpu.models import whisper_encoder
    from audio_flamingo_tpu.ops.quant import quantize_encoder_params

    cfg = WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=3,
                               num_heads=4, ffn_dim=64, max_source_positions=12)
    params = whisper_encoder.init(jax.random.PRNGKey(5), cfg)
    qparams = quantize_encoder_params(params)
    assert "w" not in qparams["layers"]["q"] and "w_q" in qparams["layers"]["q"]
    assert qparams["layers"]["q"]["w_q"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(qparams["conv1_w"]),
                                  np.asarray(params["conv1_w"]))
    np.testing.assert_array_equal(np.asarray(qparams["layers"]["ln1_w"]),
                                  np.asarray(params["layers"]["ln1_w"]))

    mels = jnp.asarray(np.random.default_rng(5).normal(size=(2, 24, 16)),
                       jnp.float32)
    ref = whisper_encoder.apply(params, cfg, mels)
    got = whisper_encoder.apply(qparams, cfg, mels)
    assert got.shape == ref.shape
    rel = float(jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-6))
    assert rel < 0.05, rel


def test_gqa_attention_q8_matches_dequant():
    """Scale-folded int8-cache attention == dequantize-then-attend (exact in f32:
    both factorizations compute the same sums, just ordered differently)."""
    from audio_flamingo_tpu.ops.attention import gqa_attention, gqa_attention_q8

    rng = np.random.default_rng(7)
    b, s, nh, nkv, hd, C = 2, 1, 8, 2, 32, 24
    q = jnp.asarray(rng.normal(size=(b, s, nh, hd)), jnp.float32)
    k_q = jnp.asarray(rng.integers(-127, 128, size=(b, C, nkv, hd)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, size=(b, C, nkv, hd)), jnp.int8)
    ks = jnp.asarray(rng.uniform(1e-4, 1e-2, size=(b, C, nkv)), jnp.float32)
    vs = jnp.asarray(rng.uniform(1e-4, 1e-2, size=(b, C, nkv)), jnp.float32)
    mask = jnp.asarray(rng.random((b, 1, s, C)) > 0.3)
    k_deq = (k_q.astype(jnp.float32) * ks[..., None])
    v_deq = (v_q.astype(jnp.float32) * vs[..., None])
    ref = gqa_attention(q, k_deq, v_deq, mask=mask)
    out = gqa_attention_q8(q, k_q, v_q, ks, vs, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)
