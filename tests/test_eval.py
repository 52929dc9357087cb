"""Eval metric + harness tests."""

import numpy as np
import pytest

import jax

from audio_flamingo_tpu.eval import metrics as M
from audio_flamingo_tpu.eval.harness import EvalExample, evaluate

jax.config.update("jax_default_matmul_precision", "highest")


def test_wer_basic():
    assert M.wer("the cat sat", "the cat sat") == 0.0
    assert M.wer("the cat sat", "the cat") == pytest.approx(1 / 3)
    assert M.wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert M.wer("a b c d", "") == 1.0


def test_wer_normalization():
    assert M.wer("Hello, World!", "hello world") == 0.0


def test_corpus_wer_weighted():
    refs = ["one two three four", "x"]
    hyps = ["one two three four", "y"]
    assert M.corpus_wer(refs, hyps) == pytest.approx(1 / 5)


def test_mcq_extraction():
    assert M.extract_choice("The answer is (B).") == "B"
    assert M.extract_choice("A or C... final: C") == "C"
    assert M.extract_choice("no letters here") is None
    assert M.mcq_accuracy(["B", "A"], ["I pick (B)", "answer: C"]) == 0.5


def test_strip_think():
    assert M.strip_think("<think>blah</think>answer") == "answer"
    assert M.strip_think("plain") == "plain"


def test_cider_d_sanity():
    refs = [["a dog barks in the yard"], ["soft piano music plays"]]
    good = ["a dog barks in the yard", "soft piano music plays"]
    bad = ["completely unrelated words here", "nothing matches at all"]
    assert M.cider_d(refs, good) > M.cider_d(refs, bad)
    assert M.cider_d(refs, good) > 5.0  # perfect match scores high


def test_harness_end_to_end():
    import jax.numpy as jnp

    from audio_flamingo_tpu.api import AudioFlamingo

    model = AudioFlamingo.from_random(compute_dtype=jnp.float32)
    wav = np.zeros(16000, np.float32)
    examples = [
        EvalExample(audio=wav, prompt="Transcribe.", target="hello", task="asr"),
        EvalExample(audio=wav, prompt="Choose A or B.", target="A", task="mcq"),
        EvalExample(audio=None, prompt="What?", target="something", task="qa"),
        EvalExample(audio=wav, prompt="Caption.", target=["a sound"], task="caption"),
    ]
    res = evaluate(model, examples, max_new_tokens=4)
    assert set(res.task_scores) == {"asr_wer", "mcq_acc", "qa_acc", "caption_cider_d"}
    assert res.serving["n_examples"] == 4
    assert all(np.isfinite(v) for v in res.task_scores.values())


def test_harness_batched_matches_sequential():
    """Engine-backed evaluation produces identical answers to the sequential harness
    (greedy), at identical scores."""
    import jax.numpy as jnp

    from audio_flamingo_tpu.api import AudioFlamingo
    from audio_flamingo_tpu.eval.harness import evaluate_batched

    model = AudioFlamingo.from_random(compute_dtype=jnp.float32)
    wav = np.zeros(16000, np.float32)
    examples = [
        EvalExample(audio=None, prompt=f"question {i}?", target="x", task="qa")
        for i in range(5)
    ] + [EvalExample(audio=wav, prompt="Transcribe.", target="hello", task="asr")]
    seq = evaluate(model, examples, max_new_tokens=4)
    bat = evaluate_batched(model, examples, max_new_tokens=4, num_slots=2, capacity=2048,
                           chunk=2)
    for a, b in zip(seq.per_example, bat.per_example):
        assert a["answer"] == b["answer"], (a, b)
    assert seq.task_scores == bat.task_scores
