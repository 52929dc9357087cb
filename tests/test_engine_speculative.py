"""Batched speculative decoding in the slot engine.

Exactness contract: with a draft attached, the engine's greedy output must equal
target-only greedy decoding TOKEN FOR TOKEN regardless of the draft's quality —
a perfect draft (the target itself) exercises the all-accept path, an independent
random draft exercises per-row rejection/rollback. Semantic model:
[hf] generation/candidate_generator.py assisted decoding (greedy acceptance rule),
re-designed as a single-device-dispatch fori_loop over per-row cache offsets.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 127
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1, num_heads=4,
                                 ffn_dim=64, max_source_positions=12),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    audio_token_id=120,
)
DRAFT_CFG = Qwen2Config(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_layers=1, num_heads=4, num_kv_heads=2,
                        tie_word_embeddings=True)


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def draft_params():
    return qwen2.init(jax.random.PRNGKey(7), DRAFT_CFG)


def _reference_tokens(params, ids, max_new):
    tokens, lengths = gen.generate(params, CFG, jnp.asarray(ids), None,
                                   max_new_tokens=max_new, eos_token_id=EOS,
                                   sampling=SamplingParams(greedy=True),
                                   capacity=256, compute_dtype=jnp.float32)
    return [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]


def _run_engine(params, prompts, max_new, **kw):
    engine = BatchEngine(params=params, cfg=CFG, capacity=256,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, **kw)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p.astype(np.int32),
                              max_new_tokens=max_new))
    return engine.run_until_done()


def _check_vs_reference(params, prompts, results, max_new):
    for i, p in enumerate(prompts):
        ref = _reference_tokens(params, p.astype(np.int32), max_new)
        got = results[f"r{i}"]
        n = min(len(ref), len(got))
        assert got[:n] == ref[:n], (i, got, ref)


def test_spec_engine_perfect_draft(params):
    """Draft == target LM: every proposal accepted; output still exactly greedy."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 120, size=(1, 5 + i)) for i in range(4)]
    results = _run_engine(params, prompts, 12, num_slots=2,
                          draft_params=params["lm"], draft_cfg=CFG.lm,
                          spec_k=3, spec_rounds=2)
    assert set(results) == {f"r{i}" for i in range(4)}
    _check_vs_reference(params, prompts, results, 12)


def test_spec_engine_random_draft(params, draft_params):
    """Independent random draft: near-zero acceptance; rollback must keep exactness."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 120, size=(1, 4 + 2 * i)) for i in range(3)]
    results = _run_engine(params, prompts, 10, num_slots=3,
                          draft_params=draft_params, draft_cfg=DRAFT_CFG,
                          spec_k=4, spec_rounds=3)
    _check_vs_reference(params, prompts, results, 10)


def test_spec_engine_slot_reuse(params, draft_params):
    """More requests than slots: reused slots must not leak draft or target KV."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 120, size=(1, 6)) for _ in range(4)]
    results = _run_engine(params, prompts, 8, num_slots=1,
                          draft_params=draft_params, draft_cfg=DRAFT_CFG,
                          spec_k=2, spec_rounds=2)
    _check_vs_reference(params, prompts, results, 8)


def test_spec_engine_sampling_routes_to_leviathan(params, draft_params):
    """Non-greedy sampling with a draft routes to the SAMPLED speculative path
    (Leviathan; tests/test_spec_sampled_engine.py carries the law checks)."""
    engine = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256,
                         eos_token_id=EOS,
                         sampling=SamplingParams(greedy=False, temperature=0.8),
                         compute_dtype=jnp.float32,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG)
    assert not engine._speculating() and engine._spec_sampled()
    engine.submit(Request(request_id="s", ids=np.arange(1, 7, dtype=np.int32)[None],
                          max_new_tokens=6))
    results = engine.run_until_done()
    assert len(results["s"]) >= 1


def test_spec_engine_accept_sim_harness(params, draft_params):
    """The acceptance-injection measurement harness (spec_accept_sim): every real
    computation still runs; at a=1.0 each round emits up to k+1 tokens per row
    (draft proposals + correction), at a=0.0 exactly 1. Token CONTENT is
    meaningless by design — this gates mechanics (counts, termination, no crash)."""
    for a, min_per_round in ((1.0, 3), (0.0, 1)):
        engine = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256,
                             eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                             compute_dtype=jnp.float32,
                             draft_params=draft_params, draft_cfg=DRAFT_CFG,
                             spec_k=2, spec_rounds=2, spec_accept_sim=a)
        assert engine._speculating()
        engine.submit(Request(request_id="x",
                              ids=np.arange(1, 7, dtype=np.int32)[None],
                              max_new_tokens=9))
        results = engine.run_until_done(max_rounds=50)
        assert 1 <= len(results["x"]) <= 9


def test_spec_stats_acceptance_estimate(params):
    """record_spec_stats: with the target as its own draft (all proposals
    accepted) the live acceptance estimate approaches 1; observability parity
    with production spec counters."""
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 120, size=(1, 6)) for _ in range(2)]
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32,
                         draft_params=params["lm"], draft_cfg=CFG.lm,
                         spec_k=3, spec_rounds=2)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p.astype(np.int32),
                              max_new_tokens=12))
    engine.run_until_done()
    st = engine.spec_stats
    assert st["emitted"] > 0 and st["round_slots"] > 0
    # perfect draft: most rounds emit k+1 (EOS/tail rounds bias low)
    assert st["acceptance_est"] > 0.5, st


def test_spec_guard_disables_low_acceptance_mid_flight(params, draft_params):
    """Acceptance guardrail (VERDICT r3 #5): an operator who attaches a mediocre
    draft must NOT get a silent throughput regression. With an independent random
    draft (natural acceptance ~0 on these random models) the live estimator trips
    spec_guard after spec_guard_warmup round-slots, the engine flips to the PLAIN
    decode path mid-flight, and the emitted stream stays exactly target-greedy
    (speculation is output-invariant, so the switch is unobservable in tokens)."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 120, size=(1, 5 + i)) for i in range(2)]
    warmup = 8
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32,
                         draft_params=draft_params, draft_cfg=DRAFT_CFG,
                         spec_k=3, spec_rounds=2, spec_guard_warmup=warmup,
                         spec_guard_min_accept=0.5)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p.astype(np.int32),
                              max_new_tokens=24))
    results = engine.run_until_done()
    st = engine.spec_stats
    assert engine.spec_disabled and st.get("guard_disabled"), st
    assert st["acceptance_est"] < 0.5, st
    # the guard acted promptly: at most one spec chunk past the warmup threshold
    assert st["round_slots"] <= warmup + 2 * engine.spec_rounds, st
    # once disabled the gates route every later chunk through the plain path
    assert not engine._speculating() and not engine._spec_sampled()
    _check_vs_reference(params, prompts, results, 24)


def test_spec_guard_leaves_good_draft_alone(params):
    """With the target as its own draft (acceptance ~1) the guard never trips,
    even with an aggressive threshold and tiny warmup."""
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, 120, size=(1, 6)) for _ in range(2)]
    engine = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256,
                         eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32,
                         draft_params=params["lm"], draft_cfg=CFG.lm,
                         spec_k=3, spec_rounds=2, spec_guard_warmup=4,
                         spec_guard_min_accept=0.5)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=f"r{i}", ids=p.astype(np.int32),
                              max_new_tokens=16))
    results = engine.run_until_done()
    assert not engine.spec_disabled, engine.spec_stats
    assert "guard_disabled" not in engine.spec_stats
    _check_vs_reference(params, prompts, results, 16)
