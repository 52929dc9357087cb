"""Generation-feature parity: min_new_tokens (EOS masking, [hf]
MinNewTokensLengthLogitsProcessor), stop sequences ([hf] stop_strings role at the
token level), and per-token logprobs ([hf] output_scores role) — in the compiled
generate() loop and in the serving engines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request, _find_stop
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

jax.config.update("jax_default_matmul_precision", "highest")

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


@pytest.fixture(scope="module")
def prompt():
    return jnp.asarray(np.random.default_rng(0).integers(0, 120, (1, 7)), jnp.int32)


def _greedy(params, prompt, eos, **kw):
    toks, lens = gen.generate(params, CFG, prompt, max_new_tokens=10,
                              eos_token_id=eos, capacity=128,
                              sampling=kw.pop("sampling", SamplingParams(greedy=True)),
                              compute_dtype=jnp.float32, **kw)
    return [int(t) for t in np.asarray(toks)[0][: int(lens[0])]]


def test_min_new_tokens_blocks_early_eos(params, prompt):
    base = _greedy(params, prompt, eos=-2)     # no eos: the raw greedy stream
    eos = base[1]                              # force "eos" = the 2nd greedy token
    short = _greedy(params, prompt, eos=eos)
    assert len(short) == 2 and short[-1] == eos
    long = _greedy(params, prompt, eos=eos,
                   sampling=SamplingParams(greedy=True, min_new_tokens=5))
    assert len(long) >= 5
    assert eos not in long[:4]                 # masked for the first 5 samples


def test_stop_sequences_generate(params, prompt):
    base = _greedy(params, prompt, eos=-2)
    stop = tuple(base[2:4])
    got = _greedy(params, prompt, eos=-2, stop_sequences=(stop,))
    # stops right after the EARLIEST occurrence (the sequence may also occur
    # before index 2 when tokens repeat)
    assert got == base[:_find_stop(base, [list(stop)])]
    # a never-occurring stop changes nothing
    got2 = _greedy(params, prompt, eos=-2, stop_sequences=((121, 122, 123),))
    assert got2 == base


def test_logprobs_match_teacher_forced(params, prompt):
    toks, lens, lp = gen.generate(params, CFG, prompt, max_new_tokens=6,
                                  eos_token_id=-2, capacity=128,
                                  sampling=SamplingParams(greedy=True),
                                  compute_dtype=jnp.float32, return_logprobs=True)
    n = int(lens[0])
    full = jnp.concatenate([prompt, toks[:, :n]], axis=1)
    logits = af3.logits(params, CFG, full, None, compute_dtype=jnp.float32)
    ref_lp = jax.nn.log_softmax(logits[0], axis=-1)
    t0 = prompt.shape[1]
    for i in range(n):
        want = float(ref_lp[t0 - 1 + i, int(toks[0, i])])
        np.testing.assert_allclose(float(lp[0, i]), want, atol=2e-4, rtol=2e-4)


def test_find_stop_helper():
    assert _find_stop([1, 2, 3, 4], [[2, 3]]) == 3
    assert _find_stop([1, 2, 3, 4], [[9], [3, 4]]) == 4
    assert _find_stop([1, 2], [[2, 3]]) is None
    assert _find_stop([5, 5, 5], [[5]]) == 1


@pytest.mark.parametrize("engine_cls,kw", [
    (BatchEngine, dict(num_slots=2, capacity=256, chunk=4)),
    (PagedEngine, dict(num_rows=2, num_blocks=24, block_size=8,
                       max_blocks_per_seq=8, chunk=4)),
])
def test_engine_features(params, engine_cls, kw):
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 120, (1, 7)).astype(np.int32)

    def run(**req_kw):
        eng = engine_cls(params=params, cfg=CFG, eos_token_id=127,
                         sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, **kw)
        req = Request(request_id="r", ids=ids.copy(), max_new_tokens=10, **req_kw)
        eng.submit(req)
        out = eng.run_until_done()["r"]
        return out, req

    base, _ = run()
    # force "eos" = the first greedy token that DIFFERS from the leading run
    eos = next((t for t in base[1:] if t != base[0]), None)
    assert eos is not None, base
    idx = base.index(eos)

    def run_eos(**req_kw):
        eng = engine_cls(params=params, cfg=CFG, eos_token_id=eos,
                         sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, **kw)
        req = Request(request_id="r", ids=ids.copy(), max_new_tokens=10, **req_kw)
        eng.submit(req)
        return eng.run_until_done()["r"], req

    short, _ = run_eos()
    assert short == base[: idx + 1]            # stops at the forced eos
    floor = min(idx + 3, 9)
    floored, _ = run_eos(min_new_tokens=floor)
    assert len(floored) >= floor
    assert eos not in floored[: floor - 1]     # masked until the floor

    # stop sequences: stop right after the earliest occurrence of base[2:4]
    stopped, _ = run(stop=[list(base[2:4])])
    assert stopped == base[:_find_stop(base, [list(base[2:4])])]

    # logprobs vs teacher-forced full forward
    out, req = run(logprobs=True)
    assert len(req.token_logprobs) == len(out)
    full = jnp.asarray(np.concatenate([ids, np.asarray(out, np.int32)[None]], axis=1))
    logits = af3.logits(params, CFG, full, None, compute_dtype=jnp.float32)
    ref_lp = jax.nn.log_softmax(logits[0], axis=-1)
    t0 = ids.shape[1]
    for i, (tok, got) in enumerate(zip(out, req.token_logprobs)):
        want = float(ref_lp[t0 - 1 + i, tok])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_min_new_tokens_ragged_and_stream(params, prompt):
    """The ragged-batch path and the host streaming loop honor min_new_tokens."""
    base = _greedy(params, prompt, eos=-2)
    eos = base[1]
    # ragged path: prompt_len as a [B] vector routes through _generate_rows
    toks, lens = gen.generate(
        params, CFG, jnp.concatenate([prompt, prompt], 0), max_new_tokens=10,
        eos_token_id=eos, capacity=128,
        sampling=SamplingParams(greedy=True, min_new_tokens=5),
        compute_dtype=jnp.float32,
        prompt_len=jnp.asarray([prompt.shape[1]] * 2, jnp.int32))
    for r in range(2):
        row = [int(t) for t in np.asarray(toks)[r][: int(lens[r])]]
        assert len(row) >= 5 and eos not in row[:4], row
    # streaming loop
    streamed = list(gen.generate_stream(
        params, CFG, prompt, max_new_tokens=10, eos_token_id=eos,
        sampling=SamplingParams(greedy=True, min_new_tokens=5),
        compute_dtype=jnp.float32))
    assert len(streamed) >= 5 and eos not in streamed[:4], streamed


def test_flamingo_generate_stops_and_logprobs():
    """The AF1/AF2 (gated-xattn) generate path carries the same stop-sequence and
    logprob features (it shares decode_loop)."""
    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig
    from audio_flamingo_tpu.models import flamingo

    cfg = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2,
        audio_embed_dim=16,
    )
    params = flamingo.init(jax.random.PRNGKey(0), cfg)
    params["xattn"]["alpha_xattn"] = jnp.full_like(params["xattn"]["alpha_xattn"], 0.5)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 90, (1, 6)), jnp.int32)
    wins = jnp.asarray(rng.normal(size=(1, 1, 3, 16)), jnp.float32)

    toks, lens, lp = flamingo.generate(params, cfg, ids, wins, max_new_tokens=8,
                                       eos_token_id=-2, compute_dtype=jnp.float32,
                                       return_logprobs=True)
    base = [int(t) for t in np.asarray(toks)[0][: int(lens[0])]]
    assert all(float(x) <= 0.0 for x in np.asarray(lp)[0][: len(base)])
    stop = tuple(base[1:3])
    toks2, lens2 = flamingo.generate(params, cfg, ids, wins, max_new_tokens=8,
                                     eos_token_id=-2, compute_dtype=jnp.float32,
                                     stop_sequences=(stop,))
    got = [int(t) for t in np.asarray(toks2)[0][: int(lens2[0])]]
    assert got == base[:_find_stop(base, [list(stop)])], (got, base)


def test_stop_longer_than_budget_is_noop(params, prompt):
    """A stop sequence longer than max_new_tokens can never fire — it must be
    ignored, not crash the trace (review finding)."""
    base = _greedy(params, prompt, eos=-2)
    got = _greedy(params, prompt, eos=-2,
                  stop_sequences=(tuple(range(1, 15)),))   # len 14 > max_new 10
    assert got == base


@pytest.mark.parametrize("engine_cls,kw", [
    (BatchEngine, dict(num_slots=2, capacity=256, chunk=4)),
    (PagedEngine, dict(num_rows=2, num_blocks=24, block_size=8,
                       max_blocks_per_seq=8, chunk=4)),
])
def test_stream_respects_stop_trim(params, engine_cls, kw):
    """on_tokens must never deliver tokens that the stop-sequence trim removes
    from the final result (review finding: callbacks fired before trimming)."""
    rng = np.random.default_rng(6)
    ids = rng.integers(0, 120, (1, 7)).astype(np.int32)

    def run(**req_kw):
        eng = engine_cls(params=params, cfg=CFG, eos_token_id=127,
                         sampling=SamplingParams(greedy=True),
                         compute_dtype=jnp.float32, **kw)
        req = Request(request_id="r", ids=ids.copy(), max_new_tokens=10, **req_kw)
        eng.submit(req)
        return eng.run_until_done()["r"], req

    base, _ = run()
    streamed: list[int] = []
    out, req = run(stop=[list(base[2:4])], logprobs=True,
                   on_tokens=streamed.extend)
    assert streamed == out, (streamed, out)
    assert len(req.token_logprobs) == len(out)
    assert req.timer.n_tokens == len(out)


def test_first_token_eos_recorded_in_metrics(params):
    """A request finishing at admission (first sampled token == eos) must still
    appear in request_metrics (review finding: BatchEngine skipped it)."""
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 120, (1, 7)).astype(np.int32)
    eng0 = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256, chunk=4,
                       eos_token_id=127, sampling=SamplingParams(greedy=True),
                       compute_dtype=jnp.float32)
    eng0.submit(Request(request_id="probe", ids=ids.copy(), max_new_tokens=4))
    first = eng0.run_until_done()["probe"][0]
    eng = BatchEngine(params=params, cfg=CFG, num_slots=1, capacity=256, chunk=4,
                      eos_token_id=first, sampling=SamplingParams(greedy=True),
                      compute_dtype=jnp.float32)
    eng.submit(Request(request_id="r", ids=ids.copy(), max_new_tokens=4))
    res = eng.run_until_done()
    assert res["r"] == [first]
    assert "r" in eng.request_metrics and eng.request_metrics["r"]["tokens"] == 1


def test_flamingo_engine_accepts_repetition_penalty(params):
    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig
    from audio_flamingo_tpu.models import flamingo as flamingo_mod
    from audio_flamingo_tpu.runtime.flamingo_engine import (FlamingoEngine,
                                                            FlamingoRequest)

    cfg2 = AF2Config(
        clap=ClapAudioConfig(),
        lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       tie_word_embeddings=True),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        num_audio_transform_layers=2, audio_embed_dim=16)
    p2 = flamingo_mod.init(jax.random.PRNGKey(0), cfg2)
    eng = FlamingoEngine(params=p2, cfg=cfg2, num_slots=1, capacity=128,
                         eos_token_id=90, compute_dtype=jnp.float32)
    # round-3: engines support the history processors (device-side per-row buffer);
    # exactness is gated in test_engine_history_processors.py — here just accept+run
    eng.submit(FlamingoRequest(request_id="x", ids=np.zeros((1, 4), np.int32),
                               max_new_tokens=3,
                               sampling=SamplingParams(greedy=True,
                                                       repetition_penalty=1.3)))
    assert len(eng.run_until_done()["x"]) >= 1
