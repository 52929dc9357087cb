"""Activation recompute (remat) + gradient accumulation tests.

The reference lineage trains long-context with DeepSpeed activation checkpointing and
microbatching (SURVEY.md §2.8/§3.3); here the equivalents are `jax.checkpoint` policies
on the layer scans (ops/remat.py, cfg.remat) and `train_step(accum_steps=N)`.

Gates:
- remat changes MEMORY, not math: loss and grads identical across policies;
- accumulated grads == full-batch grads exactly in semantics (global valid-count
  normalization), including with uneven -100 label masking across microbatches;
- remat measurably shrinks the compiled backward's temp memory (XLA memory_analysis).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.train.stages import AF3_STAGES
from audio_flamingo_tpu.train.train_step import init_state, make_jit_train_step

jax.config.update("jax_default_matmul_precision", "highest")


def _with_remat(cfg: AF3Config, lm_remat: str, enc_remat: str = "none") -> AF3Config:
    return dataclasses.replace(
        cfg,
        lm=dataclasses.replace(cfg.lm, remat=lm_remat),
        encoder=dataclasses.replace(cfg.encoder, remat=enc_remat),
    )


@pytest.fixture(scope="module")
def tiny():
    cfg = AF3Config.tiny()
    cfg = dataclasses.replace(cfg, lm=dataclasses.replace(cfg.lm, vocab_size=256))
    params = af3.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 4, 32
    ids = jnp.asarray(rng.integers(5, 250, (b, t)), jnp.int32)
    # uneven label masking per row: row i trains on the last 4*(i+1) positions
    labels = np.asarray(ids).copy()
    for i in range(b):
        labels[i, : t - 4 * (i + 1)] = -100
    labels = jnp.asarray(labels)
    nw = 1
    mels = jnp.asarray(rng.normal(size=(b, nw, 3000, cfg.encoder.num_mel_bins)) * 0.1,
                       jnp.float32)
    # mark audio positions so the encoder participates in the graph/grads
    tpw = af3.tokens_per_window(cfg)
    ids = ids.at[:, 1 : 1 + min(tpw, 8)].set(cfg.audio_token_id)
    return cfg, params, {"ids": ids, "labels": labels, "mels": mels}


def _loss_and_grads(cfg, params, batch):
    fn = jax.jit(lambda p: af3.loss(p, cfg, batch["ids"], batch["labels"],
                                    batch["mels"], compute_dtype=jnp.float32))
    return jax.value_and_grad(fn)(params)


@pytest.mark.full
def test_remat_policies_match_dense(tiny):
    cfg, params, batch = tiny
    base_loss, base_grads = _loss_and_grads(_with_remat(cfg, "none"), params, batch)
    for lm_pol, enc_pol in [("dots", "none"), ("full", "full"), ("dots", "dots")]:
        loss, grads = _loss_and_grads(_with_remat(cfg, lm_pol, enc_pol), params, batch)
        np.testing.assert_allclose(float(loss), float(base_loss), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(base_grads), jax.tree.leaves(grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                       atol=1e-6)


def test_bad_remat_policy_raises():
    from audio_flamingo_tpu.ops.remat import remat_wrap

    with pytest.raises(ValueError):
        remat_wrap(lambda x: x, "bogus")


def test_remat_reduces_backward_temp_memory(tiny):
    """The point of remat: the compiled backward's temporary buffer footprint shrinks.

    Uses XLA's memory_analysis on the compiled grad executables (CPU backend reports
    it too). A text-only batch with a longer sequence makes the L x T x d residual
    saving dominate so the reduction is unambiguous."""
    cfg, params, _ = tiny
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 250, (2, 512)), jnp.int32)
    labels = ids

    def temp_bytes(c):
        fn = jax.jit(jax.grad(
            lambda p: af3.loss(p, c, ids, labels, None, compute_dtype=jnp.float32)))
        compiled = fn.lower(params).compile()
        ma = compiled.memory_analysis()
        if ma is None or not hasattr(ma, "temp_size_in_bytes"):
            pytest.skip("memory_analysis unavailable on this backend")
        return ma.temp_size_in_bytes

    dense = temp_bytes(_with_remat(cfg, "none"))
    full = temp_bytes(_with_remat(cfg, "full"))
    assert full < dense * 0.75, (dense, full)


def test_accum_matches_dense_exactly(tiny):
    """accum_steps=N normalizes by the GLOBAL valid count, so with uneven per-row
    label masking (rows carry 4/8/12/16 valid tokens) the accumulated step equals the
    full-batch step — the average-of-averages bug this design avoids would be off by
    ~30% here."""
    cfg, params, batch = tiny
    stage = AF3_STAGES["3_full_ft"]

    results = {}
    for accum in (1, 2, 4):
        state, opt = init_state(jax.tree.map(jnp.copy, params), stage,
                                warmup_steps=1, total_steps=10)
        step_fn = make_jit_train_step(cfg, opt, compute_dtype=jnp.float32,
                                      accum_steps=accum)
        new_state, m = step_fn(state, batch)
        results[accum] = (float(m["loss"]), float(m["grad_norm"]), new_state.params)

    loss1, gn1, p1 = results[1]
    for accum in (2, 4):
        loss_a, gn_a, p_a = results[accum]
        np.testing.assert_allclose(loss_a, loss1, rtol=1e-6)
        np.testing.assert_allclose(gn_a, gn1, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p_a)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                       atol=1e-6)


def test_accum_composes_with_remat(tiny):
    cfg, params, batch = tiny
    stage = AF3_STAGES["3_full_ft"]
    cfg_r = _with_remat(cfg, "full", "full")
    state, opt = init_state(jax.tree.map(jnp.copy, params), stage,
                            warmup_steps=1, total_steps=10)
    step_fn = make_jit_train_step(cfg_r, opt, compute_dtype=jnp.float32, accum_steps=2)
    state2, m = step_fn(state, batch)
    # against the dense/no-remat baseline
    state_b, opt_b = init_state(jax.tree.map(jnp.copy, params), stage,
                                warmup_steps=1, total_steps=10)
    base_fn = make_jit_train_step(cfg, opt_b, compute_dtype=jnp.float32)
    state_base, mb = base_fn(state_b, batch)
    np.testing.assert_allclose(float(m["loss"]), float(mb["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_base.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_accum_composes_with_sp(tiny):
    """Gradient accumulation under sequence-parallel training (stage-3.5 shape):
    accum=2 + SP over 2 devices == dense single-device step."""
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >= 2 (fake) devices")
    cfg, params, batch = tiny
    mesh = Mesh(np.array(devices[:2]), ("model",))
    stage = AF3_STAGES["3.5_context_think"]

    state, opt = init_state(jax.tree.map(jnp.copy, params), stage,
                            warmup_steps=1, total_steps=10)
    sp_fn = make_jit_train_step(cfg, opt, mesh=mesh, sp=True, sp_attn="ring",
                                compute_dtype=jnp.float32, accum_steps=2)
    with mesh:
        state_sp, m_sp = sp_fn(state, batch)

    state_b, opt_b = init_state(jax.tree.map(jnp.copy, params), stage,
                                warmup_steps=1, total_steps=10)
    base_fn = make_jit_train_step(cfg, opt_b, compute_dtype=jnp.float32)
    state_base, m_base = base_fn(state_b, batch)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_base["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_base.params), jax.tree.leaves(state_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_chunked_ce_matches_dense(tiny):
    """Memory-efficient chunked cross-entropy (ce_chunk>0) must equal the dense CE
    in loss AND grads — it only reorders the unembed, never the math."""
    cfg, params, batch = tiny
    base = jax.jit(jax.value_and_grad(
        lambda p: af3.loss(p, cfg, batch["ids"], batch["labels"], batch["mels"],
                           compute_dtype=jnp.float32)))
    chunked = jax.jit(jax.value_and_grad(
        lambda p: af3.loss(p, cfg, batch["ids"], batch["labels"], batch["mels"],
                           compute_dtype=jnp.float32, ce_chunk=7)))  # uneven chunk
    l0, g0 = base(params)
    l1, g1 = chunked(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)
