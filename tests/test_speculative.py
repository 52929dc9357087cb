"""Speculative decoding: output must EXACTLY equal target-only greedy decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.speculative import generate_speculative

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 127
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1, num_heads=4,
                                 ffn_dim=64, max_source_positions=12),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    audio_token_id=120,
)
DRAFT_CFG = Qwen2Config(vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=1,
                        num_heads=4, num_kv_heads=2, tie_word_embeddings=True)


@pytest.fixture(scope="module")
def models():
    params = af3.init(jax.random.PRNGKey(0), CFG)
    draft = qwen2.init(jax.random.PRNGKey(7), DRAFT_CFG)
    return params, draft


@pytest.mark.parametrize("k", [1, 3, 5])
def test_speculative_equals_target_greedy(models, k):
    params, draft = models
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 120, size=(1, 7)))
    ref, ref_len = gen.generate(params, CFG, ids, None, max_new_tokens=16,
                                eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                                capacity=256, compute_dtype=jnp.float32)
    out, out_len = generate_speculative(params, draft, CFG, DRAFT_CFG, ids, None, k=k,
                                        max_new_tokens=16, eos_token_id=EOS,
                                        capacity=256, compute_dtype=jnp.float32)
    r = np.asarray(ref)[0][: int(ref_len[0])]
    o = np.asarray(out)[0][: int(out_len[0])]
    n = min(len(r), len(o))
    np.testing.assert_array_equal(o[:n], r[:n])
    assert abs(len(r) - len(o)) <= 0, (r, o)


def test_speculative_with_perfect_draft(models):
    """Draft == target: every proposal accepted; output identical, rounds minimal."""
    params, _ = models
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 120, size=(1, 5)))
    ref, ref_len = gen.generate(params, CFG, ids, None, max_new_tokens=12,
                                eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                                capacity=256, compute_dtype=jnp.float32)
    out, out_len = generate_speculative(params, params["lm"], CFG, CFG.lm, ids, None,
                                        k=4, max_new_tokens=12, eos_token_id=EOS,
                                        capacity=256, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out)[0][: int(out_len[0])],
                                  np.asarray(ref)[0][: int(ref_len[0])])


def test_speculative_with_audio(models):
    params, draft = models
    rng = np.random.default_rng(2)
    mels = rng.normal(size=(1, 1, 24, 16)).astype(np.float32)
    ids = np.array([[5, 6] + [120] * 6 + [9, 10]])
    ref, ref_len = gen.generate(params, CFG, jnp.asarray(ids), jnp.asarray(mels),
                                max_new_tokens=10, eos_token_id=EOS,
                                sampling=SamplingParams(greedy=True), capacity=256,
                                compute_dtype=jnp.float32)
    out, out_len = generate_speculative(params, draft, CFG, DRAFT_CFG, jnp.asarray(ids),
                                        jnp.asarray(mels), k=3, max_new_tokens=10,
                                        eos_token_id=EOS, capacity=256,
                                        compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out)[0][: int(out_len[0])],
                                  np.asarray(ref)[0][: int(ref_len[0])])


def test_speculative_accept_preserves_target_distribution():
    """Analytic check: marginal P(token) of the accept/resample rule == p_target.

    P(x) = p_d(x)*min(1, p_t/p_d) + P(reject)*residual(x); verified by Monte Carlo
    against the closed form AND the closed form against p_target.
    """
    from audio_flamingo_tpu.runtime.speculative import speculative_accept

    rng = np.random.default_rng(0)
    V = 8
    p_t = rng.dirichlet(np.ones(V)).astype(np.float32)
    p_d = rng.dirichlet(np.ones(V)).astype(np.float32)

    # closed form marginal
    accept_prob = np.minimum(p_t, p_d)             # p_d(x) * min(1, p_t/p_d)
    p_reject = 1.0 - accept_prob.sum()
    residual = np.maximum(p_t - p_d, 0.0)
    residual /= residual.sum()
    marginal = accept_prob + p_reject * residual
    np.testing.assert_allclose(marginal, p_t, atol=1e-6)  # math identity

    # Monte Carlo through the jax implementation
    n = 40_000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    draft_draws = jax.random.categorical(
        jax.random.PRNGKey(2), jnp.log(jnp.asarray(p_d))[None].repeat(n, 0))
    toks, _ = jax.vmap(lambda k, x: speculative_accept(
        k, jnp.asarray(p_t), jnp.asarray(p_d), x))(keys, draft_draws)
    counts = np.bincount(np.asarray(toks), minlength=V) / n
    np.testing.assert_allclose(counts, p_t, atol=0.02)


def test_speculative_sampled_greedy_limit(models):
    """At near-zero temperature the sampled-mode loop must reproduce greedy speculative
    output exactly (warp -> argmax; rejections resample a one-hot residual)."""
    from audio_flamingo_tpu.runtime.speculative import generate_speculative_sampled

    params, draft = models
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 120, size=(1, 6)))
    ref, ref_len = generate_speculative(params, draft, CFG, DRAFT_CFG, ids, None, k=3,
                                        max_new_tokens=12, eos_token_id=EOS,
                                        capacity=256, compute_dtype=jnp.float32)
    out, out_len = generate_speculative_sampled(
        params, draft, CFG, DRAFT_CFG, ids, None, rng=jax.random.PRNGKey(0),
        sampling=SamplingParams(greedy=False, temperature=1e-4), k=3,
        max_new_tokens=12, eos_token_id=EOS, capacity=256, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert int(out_len[0]) == int(ref_len[0])


def test_speculative_sampled_first_token_marginal(models):
    """The first emitted token's empirical law matches the warped target softmax
    (the exactness guarantee of Leviathan rejection sampling, end to end)."""
    from audio_flamingo_tpu.runtime.generate import prefill
    from audio_flamingo_tpu.runtime.speculative import (_warped_probs,
                                                        generate_speculative_sampled)

    params, draft = models
    sampling = SamplingParams(greedy=False, temperature=1.3, top_k=20)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 120, size=(1, 5)))
    _, logits = prefill(params, CFG, ids, None, 256, jnp.float32)
    expected = np.asarray(_warped_probs(logits.astype(jnp.float32), sampling))[0]

    n = 600
    outs = jax.vmap(lambda key: generate_speculative_sampled(
        params, draft, CFG, DRAFT_CFG, ids, None, rng=key, sampling=sampling, k=2,
        max_new_tokens=1, eos_token_id=EOS, capacity=256,
        compute_dtype=jnp.float32)[0][0, 0])(jax.random.split(jax.random.PRNGKey(4), n))
    counts = np.bincount(np.asarray(outs), minlength=128)
    emp = counts / n
    # total-variation distance small (600 samples over <=20 support)
    tv = 0.5 * np.abs(emp - expected).sum()
    assert tv < 0.12, tv


def test_speculative_sampled_deterministic_per_seed(models):
    from audio_flamingo_tpu.runtime.speculative import generate_speculative_sampled

    params, draft = models
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 120, size=(1, 6)))
    kw = dict(rng=jax.random.PRNGKey(9),
              sampling=SamplingParams(greedy=False, temperature=0.9, top_p=0.95), k=3,
              max_new_tokens=10, eos_token_id=EOS, capacity=256,
              compute_dtype=jnp.float32)
    a, la = generate_speculative_sampled(params, draft, CFG, DRAFT_CFG, ids, None, **kw)
    b, lb = generate_speculative_sampled(params, draft, CFG, DRAFT_CFG, ids, None, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(la[0]) == int(lb[0])


def test_speculative_sampled_second_token_conditional_marginal(models):
    """Conditional law of the SECOND token (which goes through draft-propose /
    accept-or-residual-resample) matches the warped target distribution at that prefix."""
    from audio_flamingo_tpu.models import qwen2 as q2
    from audio_flamingo_tpu.runtime.generate import prefill
    from audio_flamingo_tpu.runtime.speculative import (_warped_probs,
                                                        generate_speculative_sampled)

    params, draft = models
    sampling = SamplingParams(greedy=False, temperature=0.8, top_k=4)
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 120, size=(1, 5)))

    n = 1200
    outs = jax.vmap(lambda key: generate_speculative_sampled(
        params, draft, CFG, DRAFT_CFG, ids, None, rng=key, sampling=sampling, k=2,
        max_new_tokens=2, eos_token_id=EOS, capacity=256,
        compute_dtype=jnp.float32)[0][0])(jax.random.split(jax.random.PRNGKey(8), n))
    outs = np.asarray(outs)                                   # [n, 2]

    # condition on the most frequent first token
    t0 = np.bincount(outs[:, 0], minlength=128).argmax()
    sel = outs[outs[:, 0] == t0, 1]
    assert len(sel) > 200

    # expected: warped target next-token distribution after [ids, t0]
    full = jnp.concatenate([ids, jnp.asarray([[t0]], jnp.int32)], axis=1)
    logits = q2.logits_from_ids(params["lm"], CFG.lm, full)[:, -1]
    expected = np.asarray(_warped_probs(logits.astype(jnp.float32), sampling))[0]

    emp = np.bincount(sel, minlength=128) / len(sel)
    tv = 0.5 * np.abs(emp - expected).sum()
    assert tv < 0.15, tv


def test_speculative_greedy_exact_with_flash(models):
    """Regression (round-1 advisor HIGH): with cfg.use_flash=True the verify step runs
    k+1 tokens against a WARM cache — the flash fast path must not be taken there
    (it would attend only the verify block and drop all cached prompt KV)."""
    import dataclasses
    from unittest import mock
    from jax.experimental import pallas as pl

    params, draft = models
    cfg_flash = dataclasses.replace(
        CFG, lm=dataclasses.replace(CFG.lm, use_flash=True))
    rng = np.random.default_rng(13)
    ids = jnp.asarray(rng.integers(0, 120, size=(1, 9)))

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(pl, "pallas_call", patched):
        ref, ref_len = gen.generate(params, cfg_flash, ids, None, max_new_tokens=14,
                                    eos_token_id=EOS,
                                    sampling=SamplingParams(greedy=True),
                                    capacity=256, compute_dtype=jnp.float32)
        out, out_len = generate_speculative(params, draft, cfg_flash, DRAFT_CFG, ids,
                                            None, k=3, max_new_tokens=14,
                                            eos_token_id=EOS, capacity=256,
                                            compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out)[0][: int(out_len[0])],
                                  np.asarray(ref)[0][: int(ref_len[0])])
    assert int(out_len[0]) == int(ref_len[0])
