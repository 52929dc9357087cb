"""int4 (w4a16, group-scale) quantization tests: packing, kernel parity, quantized LM.

The reference serves bf16/fp16 torch checkpoints ([hf] modeling_qwen2.py); w4 is a
beyond-reference decode-bandwidth feature (ops/quant4.py). Gates mirror the int8
suite's (tests/test_quant.py) with the wider int4 tolerance band."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops.quant4 import (dequantize_w4, pack_w4, q4_matmul,
                                           quantize_linear_w4, quantize_lm_params_w4,
                                           supports_w4, unpack_w4)

jax.config.update("jax_default_matmul_precision", "highest")


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w_q = jnp.asarray(rng.integers(-8, 8, size=(64, 32)), jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_w4(pack_w4(w_q))), np.asarray(w_q))
    # stacked [L, K, N] packing round-trips too
    w_q3 = jnp.asarray(rng.integers(-8, 8, size=(3, 64, 32)), jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_w4(pack_w4(w_q3))),
                                  np.asarray(w_q3))


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    q = quantize_linear_w4(w, group_size=64)
    deq = dequantize_w4(q, jnp.float32)
    # symmetric int4: error <= scale/2 = group max / 14 per element
    groups = np.asarray(w).reshape(4, 64, 128)
    bound = np.abs(groups).max(axis=1) / 14.0 + 1e-6          # [4, 128]
    err = np.abs(np.asarray(deq - w)).reshape(4, 64, 128).max(axis=1)
    assert (err <= bound + 1e-7).all()


def test_q4_matmul_small_rows_uses_kernel_and_matches_dequant():
    """Decode-shaped call (m<=256) rides the Pallas kernel (interpret on CPU);
    must equal x @ dequantized weights exactly in f32."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 512)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(512, 256)) * 0.1, jnp.float32)
    q = quantize_linear_w4(w, group_size=128)
    ref = x @ dequantize_w4(q, jnp.float32)
    out = q4_matmul(x, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_q4_matmul_large_rows_xla_path():
    """Prefill-shaped call (m>256) takes the XLA dequant path; same math."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(300, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.1, jnp.float32)
    q = quantize_linear_w4(w, group_size=128)
    ref = x @ dequantize_w4(q, jnp.float32)
    out = q4_matmul(x, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_kernel_block_shapes():
    """Group counts that don't divide the default 4-group block (e.g. 14 groups)
    must still tile correctly; batch dims reshape through q4_matmul."""
    rng = np.random.default_rng(4)
    k = 14 * 2 * 64                                           # 14 groups per half
    x = jnp.asarray(rng.normal(size=(2, 5, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, 128)) * 0.1, jnp.float32)
    q = quantize_linear_w4(w, group_size=64)
    ref = jnp.einsum("bsk,kn->bsn", x, dequantize_w4(q, jnp.float32))
    out = q4_matmul(x, q)
    assert out.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_stacked_kernel_matches_per_layer():
    """w4a16_matmul_stacked(x, stacked, l) must equal w4a16_matmul on layer l's
    slice exactly (the stacked variant only moves the layer index into the
    kernel's BlockSpec maps)."""
    from audio_flamingo_tpu.ops.pallas.quant4_matmul import (w4a16_matmul,
                                                             w4a16_matmul_stacked)

    rng = np.random.default_rng(6)
    L, k, n = 3, 256, 384
    x = jnp.asarray(rng.normal(size=(4, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(L, k, n)) * 0.1, jnp.float32)
    q = quantize_linear_w4(w, group_size=64)
    for layer in range(L):
        ref = w4a16_matmul(x, q["w_p"][layer], q["gscale"][layer])
        out = w4a16_matmul_stacked(x, q["w_p"], q["gscale"],
                                   jnp.asarray(layer, jnp.int32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-6)


def test_quantized_qwen2_w4_logits_close():
    """w4 LM (fused qkv/gateup layout) stays in the int4 tolerance band of fp32
    logits and mostly agrees on greedy tokens; the fused tree must also produce
    EXACTLY the same logits as the unfused tree (identical quantized values,
    different kernels)."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=128, hidden_size=256, intermediate_size=512,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
                      tie_word_embeddings=False)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_lm_params_w4(params, group_size=64)
    assert "qkv" in qparams["layers"] and "q" not in qparams["layers"]
    assert "gateup" in qparams["layers"]["mlp"]
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 9)))
    ref = qwen2.logits_from_ids(params, cfg, ids)
    out = qwen2.logits_from_ids(qparams, cfg, ids)
    agree = (np.asarray(ref.argmax(-1)) == np.asarray(out.argmax(-1))).mean()
    assert agree >= 0.7, agree
    # random-init weights are the int4 worst case (no outlier structure for the
    # group scales to absorb), so the band is wider than int8's 5%
    denom = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(out - ref)).max() / denom < 0.25
    # fused == unfused: bit-identical quantization, different dispatch
    unfused = quantize_lm_params_w4(params, group_size=64, fuse=False)
    out_u = qwen2.logits_from_ids(unfused, cfg, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_u),
                               atol=2e-4, rtol=1e-4)


def test_w4_cache_decode_consistent():
    """Prefill-then-decode through a KV cache must equal the full forward with the
    SAME w4 params (quantization is deterministic; paths differ only in caching)."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=64, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      tie_word_embeddings=True)
    params = quantize_lm_params_w4(qwen2.init(jax.random.PRNGKey(1), cfg),
                                   group_size=64)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (1, 8)))
    full = qwen2.logits_from_ids(params, cfg, ids)
    cache = qwen2.init_cache(cfg, 1, 16, dtype=jnp.float32)
    x = qwen2.embed(params, ids, dtype=jnp.float32)
    h, cache = qwen2.forward(params, cfg, x, jnp.arange(8)[None], cache=cache)
    np.testing.assert_allclose(np.asarray(qwen2.unembed(params, cfg, h)),
                               np.asarray(full), atol=2e-4, rtol=1e-4)


def test_w4_fallback_for_unaligned_shapes():
    """Tiny configs whose K doesn't align to 2*group fall back to int8 per-linear;
    the tree still runs end-to-end."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=64, hidden_size=48, intermediate_size=96,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      tie_word_embeddings=True)
    assert not supports_w4(48, 128)
    params = quantize_lm_params_w4(qwen2.init(jax.random.PRNGKey(2), cfg))
    assert "w_q" in params["layers"]["q"]           # int8 fallback
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 64, (1, 6)))
    out = qwen2.logits_from_ids(params, cfg, ids)
    assert np.isfinite(np.asarray(out)).all()


def test_w4_engine_matches_generate():
    """Continuous-batching engine on w4 params == single-request generate token-
    exactly (both ride the same _linear dispatch; equality proves the serving path
    composes with int4 weights)."""
    from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime import generate as gen
    from audio_flamingo_tpu.runtime.engine import BatchEngine, Request

    cfg = AF3Config(
        encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1,
                                     num_heads=4, ffn_dim=64,
                                     max_source_positions=12),
        lm=Qwen2Config(vocab_size=128, hidden_size=128, intermediate_size=256,
                       num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                       tie_word_embeddings=True),
        audio_token_id=120)
    params = af3.init(jax.random.PRNGKey(4), cfg)
    params["lm"] = quantize_lm_params_w4(params["lm"], group_size=64)
    assert "w_p" in params["lm"]["layers"]["qkv"]
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 120, (1, 5 + 2 * i)).astype(np.int32)
               for i in range(3)]
    engine = BatchEngine(params=params, cfg=cfg, num_slots=2, capacity=64,
                         chunk=4, eos_token_id=-2,
                         sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=8))
    out = engine.run_until_done()
    for i, p in enumerate(prompts):
        tokens, lengths = gen.generate(params, cfg, jnp.asarray(p), None,
                                       max_new_tokens=8, eos_token_id=-2,
                                       sampling=SamplingParams(greedy=True),
                                       capacity=64, compute_dtype=jnp.float32)
        ref = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]
        assert out[f"r{i}"] == ref, (i, out[f"r{i}"], ref)


def test_w4_generate_greedy_runs():
    """End-to-end generate on a w4 LM through the AF3 runtime path."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime import generate as gen

    cfg = Qwen2Config(vocab_size=96, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      tie_word_embeddings=True)

    class _Wrap:
        lm = cfg
        audio_token_id = 95

    params = {"lm": quantize_lm_params_w4(qwen2.init(jax.random.PRNGKey(3), cfg),
                                          group_size=64)}
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 90, (1, 7)))
    tokens, lengths = gen.generate(params, _Wrap, ids, None, max_new_tokens=8,
                                   eos_token_id=-2,
                                   sampling=SamplingParams(greedy=True),
                                   capacity=32, compute_dtype=jnp.float32)
    assert int(lengths[0]) == 8
    assert np.isfinite(np.asarray(tokens, np.float32)).all()


@pytest.mark.parametrize("qcache", [False, True], ids=["bf16-cache", "q8-cache"])
def test_w4_suffix_path_matches_four_call(qcache):
    """The 2-call suffix decode path (ops/pallas/quant4_block.py) must match the
    per-matmul fused path: prefill via the normal path, then one s=1 decode step
    through the suffix kernels vs the same step on an UNFUSED tree (identical
    quantized values, no suffix eligibility)."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2
    from audio_flamingo_tpu.models.qwen2 import split_stacked_w4
    from audio_flamingo_tpu.ops.pallas.quant4_block import suffix_supported

    cfg = Qwen2Config(vocab_size=128, hidden_size=256, intermediate_size=512,
                      num_layers=3, num_heads=4, num_kv_heads=2, head_dim=64,
                      tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    fused = quantize_lm_params_w4(params, group_size=64)
    unfused = quantize_lm_params_w4(params, group_size=64, fuse=False)
    st, _ = split_stacked_w4(fused["layers"])
    assert suffix_supported(st, cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 6)))

    def run(p):
        x = qwen2.embed(p, ids, dtype=jnp.float32)
        cache = (qwen2.init_cache_q8(cfg, 2, 16) if qcache
                 else qwen2.init_cache(cfg, 2, 16, dtype=jnp.float32))
        h, cache = qwen2.forward(p, cfg, x, jnp.arange(6)[None].repeat(2, 0),
                                 cache=cache)
        nxt = jnp.argmax(qwen2.unembed(p, cfg, h[:, -1]), -1)
        x1 = qwen2.embed(p, nxt[:, None], dtype=jnp.float32)
        pos = jnp.full((2, 1), 6, jnp.int32)
        h1, cache = qwen2.forward(p, cfg, x1, pos, cache=cache)
        return qwen2.unembed(p, cfg, h1[:, 0])

    lf, lu = run(fused), run(unfused)
    rel = float(jnp.max(jnp.abs(lf - lu))) / float(jnp.max(jnp.abs(lu)))
    assert rel < 3e-3, rel


def test_w4_paged_engine_matches_generate():
    """Paged engine on a fused-w4 tree (suffix kernels + paged attention) ==
    single-request generate token-exactly."""
    from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime import generate as gen
    from audio_flamingo_tpu.runtime.engine import Request
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

    cfg = AF3Config(
        encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1,
                                     num_heads=4, ffn_dim=64,
                                     max_source_positions=12),
        lm=Qwen2Config(vocab_size=128, hidden_size=256, intermediate_size=512,
                       num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
                       tie_word_embeddings=True),
        audio_token_id=120)
    params = af3.init(jax.random.PRNGKey(5), cfg)
    params["lm"] = quantize_lm_params_w4(params["lm"], group_size=64)
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, 120, (1, 5 + 2 * i)).astype(np.int32)
               for i in range(2)]
    engine = PagedEngine(params=params, cfg=cfg, num_rows=2, num_blocks=64,
                         block_size=16, max_blocks_per_seq=8, chunk=4,
                         eos_token_id=-2, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=8))
    out = engine.run_until_done()
    for i, p in enumerate(prompts):
        tokens, lengths = gen.generate(params, cfg, jnp.asarray(p), None,
                                       max_new_tokens=8, eos_token_id=-2,
                                       sampling=SamplingParams(greedy=True),
                                       capacity=128, compute_dtype=jnp.float32)
        ref = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]
        assert out[f"r{i}"] == ref, (i, out[f"r{i}"], ref)


def test_load_cast_preserves_quant_scales():
    """api.load's compute-dtype cast must NOT downcast int8/int4 quantization
    scales to bf16 — the kernels apply scales to the f32 partial product and
    document that as exact; a bf16 scale adds ~0.3% relative weight error."""
    from audio_flamingo_tpu.api import _cast_f32_leaves

    tree = {
        "layers": {
            "qkv": {"w_p": jnp.zeros((4, 8), jnp.int8),
                    "gscale": jnp.ones((1, 8), jnp.float32)},
            "o": {"w_q": jnp.zeros((8, 8), jnp.int8),
                  "scale": jnp.ones((8,), jnp.float32)},
            "ln1_w": jnp.ones((4, 8), jnp.float32),
        },
        "embed": {"w_q": jnp.zeros((16, 8), jnp.int8),
                  "scale": jnp.ones((16,), jnp.float32)},
    }
    out = _cast_f32_leaves(tree, jnp.bfloat16)
    assert out["layers"]["qkv"]["gscale"].dtype == jnp.float32
    assert out["layers"]["o"]["scale"].dtype == jnp.float32
    assert out["embed"]["scale"].dtype == jnp.float32
    assert out["layers"]["ln1_w"].dtype == jnp.bfloat16      # normal f32 leaf casts
    assert out["layers"]["qkv"]["w_p"].dtype == jnp.int8     # ints untouched
