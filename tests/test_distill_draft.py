"""Distilled-draft speculation pipeline (scripts/distill_draft.py) at tiny
scale on CPU: rollout collection, hard-label distillation training raising
on-distribution top-1 agreement, safetensors save/load roundtrip, and the
real accept-compare spec path staying token-exact with the trained draft.

The full-scale run (7B int8 target, 2-layer 512-hidden draft) is the one-off
`python scripts/distill_draft.py` TPU script; its output feeds bench.py's
`spec_real` section (VERDICT r4 #6)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
from scripts import distill_draft as dd

jax.config.update("jax_default_matmul_precision", "highest")

P, G = 24, 16
TGT_CFG = Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      tie_word_embeddings=True)
DRAFT_CFG = Qwen2Config(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_layers=1, num_heads=4, num_kv_heads=2,
                        tie_word_embeddings=True)


@pytest.fixture(scope="module")
def target():
    cfg = AF3Config(lm=TGT_CFG)
    params = {"lm": qwen2.init(jax.random.PRNGKey(0), TGT_CFG)}
    return params, cfg


@pytest.fixture(scope="module")
def rollouts(target):
    params, cfg = target
    return dd.collect_rollouts(params, cfg, seed=3, n_batches=2,
                               log=lambda *_: None, prompt_len=P, gen_len=G,
                               vocab_hi=120)


def test_collect_rollouts_shapes_and_determinism(target, rollouts):
    params, cfg = target
    assert rollouts.shape == (16, P + G)
    again = dd.collect_rollouts(params, cfg, seed=3, n_batches=2,
                                log=lambda *_: None, prompt_len=P, gen_len=G,
                                vocab_hi=120)
    np.testing.assert_array_equal(rollouts, again)


def _train_draft(rollouts, steps=150):
    import optax

    draft_p = qwen2.init(jax.random.PRNGKey(7), DRAFT_CFG)
    opt = optax.adamw(3e-3)
    opt_state = opt.init(draft_p)

    def loss_fn(p, ids):
        logits = dd._gen_logits(p, DRAFT_CFG, ids, prompt_len=P)
        labels = ids[:, P:]
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, labels[..., None], -1)[..., 0]
        return (lse - tgt).mean()

    @jax.jit
    def step(p, s, ids):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    ids = jnp.asarray(rollouts)
    for _ in range(steps):
        draft_p, opt_state, _ = step(draft_p, opt_state, ids[:8])
    return draft_p


def _agreement(draft_p, ids):
    logits = dd._gen_logits(draft_p, DRAFT_CFG, jnp.asarray(ids), prompt_len=P)
    return float((jnp.argmax(logits, -1) == jnp.asarray(ids)[:, P:]).mean())


def test_distillation_raises_agreement(rollouts):
    """Held-out top-1 agreement after a short distillation must clearly beat
    the untrained draft (the whole premise of the real-spec bench)."""
    held = rollouts[8:]
    before = _agreement(qwen2.init(jax.random.PRNGKey(7), DRAFT_CFG), held)
    draft_p = _train_draft(rollouts[:8])
    after = _agreement(draft_p, held)
    # tiny-scale ceiling is modest (8 train rollouts, G=16); "clearly beats"
    # = an order of magnitude over the ~1/vocab random floor
    assert after > max(5 * before, 0.2), (before, after)


def test_save_load_roundtrip(tmp_path, rollouts):
    from audio_flamingo_tpu.io.safetensors import save_safetensors

    draft_p = _train_draft(rollouts[:8], steps=20)
    path = str(tmp_path / "draft.safetensors")
    flat = dd._flatten(jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                                    draft_p))
    save_safetensors(path, flat)
    from audio_flamingo_tpu.io.safetensors import load_safetensors

    loaded = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                          dd._unflatten(load_safetensors(path)))
    ref = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), draft_p)
    la, lb = jax.tree.leaves(loaded), jax.tree.leaves(ref)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_real_spec_token_exact_with_trained_draft(target, rollouts):
    """The REAL accept-compare path (no Bernoulli injection) with a distilled
    draft: output must equal plain greedy token-for-token, and the engine's
    live acceptance estimate must be materially above the random-draft floor."""
    params, cfg = target
    draft_p = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                           _train_draft(rollouts[:8]))
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 120, (1, P)).astype(np.int32) for _ in range(4)]

    def run(**kw):
        eng = BatchEngine(params=params, cfg=cfg, num_slots=4, capacity=128,
                          chunk=8, eos_token_id=-1,
                          sampling=SamplingParams(greedy=True), **kw)
        for i, p in enumerate(prompts):
            eng.submit(Request(request_id=f"r{i}", ids=p, max_new_tokens=G))
        return eng.run_until_done(), eng

    plain, _ = run()
    spec, eng = run(draft_params=draft_p, draft_cfg=DRAFT_CFG, spec_k=3,
                    spec_rounds=2, spec_guard=False)
    assert spec == plain
    assert eng.spec_stats["acceptance_est"] > 0.1


def test_target_as_draft_real_acceptance_near_one(target):
    """With the target as its own draft and the REAL accept-compare, measured
    acceptance must be ~1.0 at f32-highest (exact-arithmetic value is 1.0;
    the only depressors are the documented end-of-request round bias). This
    pins the accept machinery itself: the measured 0.36 on a bf16 random 7B
    is then attributable to near-tie argmax flips between the multi-token
    verify forward and single-token decode (scripts/diag_verify_drift.py),
    not to a draft-path or accept-rule bug."""
    params, cfg = target
    rng = np.random.default_rng(5)
    eng = BatchEngine(params=params, cfg=cfg, num_slots=4, capacity=256,
                      chunk=8, eos_token_id=-1,
                      sampling=SamplingParams(greedy=True),
                      draft_params=params["lm"], draft_cfg=TGT_CFG,
                      spec_k=3, spec_rounds=2, spec_guard=False,
                      compute_dtype=jnp.float32)
    for i in range(4):
        eng.submit(Request(request_id=f"r{i}",
                           ids=rng.integers(0, 120, (1, P)).astype(np.int32),
                           max_new_tokens=2 * G))
    eng.run_until_done()
    assert eng.spec_stats["acceptance_est"] > 0.9, eng.spec_stats
