"""Per-request sampling in the serving engines: RowSampling (traced per-row
temperature/top-k/top-p/greedy arrays, one compiled program for any mix) and the
engine wiring (Request.sampling overrides the engine default)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import (
    NEG_INF,
    SamplingParams,
    apply_top_k,
    apply_top_k_rows,
    apply_top_p,
    apply_top_p_rows,
    row_sampling,
    sample_token_rows,
)
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 127
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1, num_heads=4,
                                 ffn_dim=64, max_source_positions=12),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    audio_token_id=120,
)


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


# ------------------------------------------------------------------- unit level

def test_row_warpers_match_scalar_warpers():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    for k in (1, 3, 17):
        got = apply_top_k_rows(logits, jnp.full((4,), k, jnp.int32))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(apply_top_k(logits, k)))
    got = apply_top_k_rows(logits, jnp.zeros((4,), jnp.int32))   # 0 = off
    np.testing.assert_array_equal(np.asarray(got), np.asarray(logits))
    for p in (0.1, 0.5, 0.9):
        got = apply_top_p_rows(logits, jnp.full((4,), p, jnp.float32))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(apply_top_p(logits, p)))
    got = apply_top_p_rows(logits, jnp.ones((4,), jnp.float32))  # 1.0 = off
    np.testing.assert_array_equal(np.asarray(got), np.asarray(logits))


def test_row_warpers_heterogeneous():
    """Each row is filtered under ITS OWN parameters."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
    ks = jnp.asarray([1, 5, 0], jnp.int32)
    out = np.asarray(apply_top_k_rows(logits, ks))
    assert (out[0] > NEG_INF / 2).sum() == 1
    assert (out[1] > NEG_INF / 2).sum() == 5
    assert (out[2] > NEG_INF / 2).sum() == 32


def test_sample_token_rows_greedy_and_topk1_deterministic():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
    rows = row_sampling([
        SamplingParams(greedy=True),
        SamplingParams(greedy=False, top_k=1, temperature=3.0),  # top_k=1 == argmax
        SamplingParams(greedy=False, top_k=4, temperature=1.0),
    ])
    tok = np.asarray(sample_token_rows(jax.random.PRNGKey(0), logits, rows))
    am = np.asarray(jnp.argmax(logits, -1))
    assert tok[0] == am[0] and tok[1] == am[1]
    # sampled row stays inside its own top-k support
    top4 = set(np.asarray(jax.lax.top_k(logits[2], 4)[1]).tolist())
    assert tok[2] in top4


# ----------------------------------------------------------------- engine level

def _greedy_reference(params, prompts, engine_cls, **kw):
    eng = engine_cls(params=params, cfg=CFG, eos_token_id=EOS,
                     sampling=SamplingParams(greedy=True),
                     compute_dtype=jnp.float32, **kw)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=f"r{i}", ids=p.copy(), max_new_tokens=8))
    return eng.run_until_done()


@pytest.mark.parametrize("engine_cls,kw", [
    (BatchEngine, dict(num_slots=2, capacity=256, chunk=4)),
    (PagedEngine, dict(num_rows=2, num_blocks=24, block_size=8,
                       max_blocks_per_seq=8, chunk=4)),
])
def test_engines_per_request_override(params, engine_cls, kw):
    """Engine default = hot sampling; requests overriding greedy / top_k=1 must
    reproduce the all-greedy engine's tokens exactly, in the same batch as a
    genuinely sampled request."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 120, (1, 6 + i)).astype(np.int32) for i in range(3)]
    ref = _greedy_reference(params, prompts, engine_cls, **kw)

    eng = engine_cls(params=params, cfg=CFG, eos_token_id=EOS,
                     sampling=SamplingParams(greedy=False, temperature=5.0),
                     compute_dtype=jnp.float32, **kw)
    eng.submit(Request(request_id="r0", ids=prompts[0].copy(), max_new_tokens=8,
                       sampling=SamplingParams(greedy=True)))
    eng.submit(Request(request_id="r1", ids=prompts[1].copy(), max_new_tokens=8,
                       sampling=SamplingParams(greedy=False, top_k=1)))
    eng.submit(Request(request_id="r2", ids=prompts[2].copy(), max_new_tokens=8))
    got = eng.run_until_done()
    assert got["r0"] == ref["r0"], (got["r0"], ref["r0"])
    assert got["r1"] == ref["r1"], (got["r1"], ref["r1"])
    assert len(got["r2"]) > 0 and all(0 <= t < 128 for t in got["r2"])


def test_engine_accepts_per_request_repetition_penalty(params):
    """Round-3: engines maintain a device-side history buffer, so per-request
    repetition penalty is supported (exactness gated in
    test_engine_history_processors.py)."""
    eng = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256,
                      eos_token_id=EOS, compute_dtype=jnp.float32)
    eng.submit(Request(request_id="x", ids=np.zeros((1, 4), np.int32),
                       max_new_tokens=3,
                       sampling=SamplingParams(greedy=True,
                                               repetition_penalty=1.3)))
    got = eng.run_until_done()
    assert len(got["x"]) >= 1


def test_streaming_callbacks(params):
    """Request.on_tokens fires as tokens emit and the concatenation equals the
    final token list (both engine types)."""
    rng = np.random.default_rng(9)
    for engine_cls, kw in [
        (BatchEngine, dict(num_slots=2, capacity=256, chunk=4)),
        (PagedEngine, dict(num_rows=2, num_blocks=24, block_size=8,
                           max_blocks_per_seq=8, chunk=4)),
    ]:
        eng = engine_cls(params=params, cfg=CFG, eos_token_id=EOS,
                         sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, **kw)
        streamed: dict[str, list[int]] = {}
        for i in range(3):
            rid = f"r{i}"
            streamed[rid] = []
            eng.submit(Request(
                request_id=rid, ids=rng.integers(0, 120, (1, 5 + i)).astype(np.int32),
                max_new_tokens=10,
                on_tokens=lambda toks, rid=rid: streamed[rid].extend(toks)))
        results = eng.run_until_done()
        for rid, toks in results.items():
            assert streamed[rid] == toks, (engine_cls.__name__, rid,
                                           streamed[rid], toks)


def test_request_metrics_recorded(params):
    """Engines record TTFT / total latency / decode tok/s per retired request
    (SURVEY.md §5 metrics row), optionally into a MetricsLogger sink."""
    from audio_flamingo_tpu.utils.metrics import MetricsLogger

    rng = np.random.default_rng(10)
    sink = MetricsLogger(verbose=False)
    eng = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256, chunk=4,
                      eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                      compute_dtype=jnp.float32, metrics=sink)
    for i in range(3):
        eng.submit(Request(request_id=f"r{i}",
                           ids=rng.integers(0, 120, (1, 5 + i)).astype(np.int32),
                           max_new_tokens=6))
    results = eng.run_until_done()
    assert set(eng.request_metrics) == set(results)
    for rid, m in eng.request_metrics.items():
        assert m["tokens"] == len(results[rid])
        assert m["ttft_s"] > 0 and m["total_s"] >= m["ttft_s"]
    assert len(sink.records) == 3

    peng = PagedEngine(params=params, cfg=CFG, num_rows=2, num_blocks=24,
                       block_size=8, max_blocks_per_seq=8, chunk=4,
                       eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                       compute_dtype=jnp.float32)
    peng.submit(Request(request_id="p", ids=rng.integers(0, 120, (1, 6)).astype(np.int32),
                        max_new_tokens=6))
    res = peng.run_until_done()
    assert peng.request_metrics["p"]["tokens"] == len(res["p"])
