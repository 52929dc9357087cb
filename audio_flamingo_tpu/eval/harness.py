"""Evaluation harness: run a model over task examples and compute task metrics.

The reference evaluates via per-benchmark scripts in `llava/eval/` (⚠recon, SURVEY.md §4);
here a single harness dispatches on task type. Tasks mirror the benchmark families in
BASELINE.md: asr (WER), mcq (choice accuracy), qa (containment), caption (CIDEr-D).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable

import numpy as np

from audio_flamingo_tpu.eval import metrics as M
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.utils.metrics import MetricsLogger, RequestTimer


@dataclass
class EvalExample:
    audio: np.ndarray | None          # mono 16 kHz f32
    prompt: str
    target: str | list[str]           # list for multi-reference captioning
    task: str = "qa"                  # asr | mcq | qa | caption


@dataclass
class EvalResult:
    task_scores: dict
    per_example: list[dict] = field(default_factory=list)
    serving: dict = field(default_factory=dict)


def evaluate(model, examples: Iterable[EvalExample], *, max_new_tokens: int = 128,
             think: bool = False, logger: MetricsLogger | None = None) -> EvalResult:
    """model: api.AudioFlamingo (or anything with .generate(sound, prompt, ...))."""
    by_task: dict[str, list[tuple]] = {}
    per_example = []
    timers = []
    for ex in examples:
        timer = RequestTimer(audio_seconds=(len(ex.audio) / 16_000 if ex.audio is not None
                                            else 0.0))
        answer = model.generate(sound=ex.audio, prompt=ex.prompt,
                                max_new_tokens=max_new_tokens,
                                sampling=SamplingParams(greedy=True), think=think)
        timer.token()
        stats = timer.finish()
        timers.append(stats)
        by_task.setdefault(ex.task, []).append((ex.target, answer))
        per_example.append({"prompt": ex.prompt, "answer": answer, "target": ex.target,
                            "task": ex.task})
        if logger:
            logger.log(task=ex.task, total_s=stats["total_s"])

    scores: dict = {}
    for task, pairs in by_task.items():
        targets = [t for t, _ in pairs]
        answers = [a for _, a in pairs]
        if task == "asr":
            scores["asr_wer"] = M.corpus_wer([t if isinstance(t, str) else t[0]
                                              for t in targets],
                                             [M.strip_think(a) for a in answers])
        elif task == "mcq":
            scores["mcq_acc"] = M.mcq_accuracy(targets, answers)
        elif task == "caption":
            refs = [[t] if isinstance(t, str) else list(t) for t in targets]
            scores["caption_cider_d"] = M.cider_d(refs, [M.strip_think(a) for a in answers])
        else:
            scores["qa_acc"] = M.containment_accuracy(
                [t if isinstance(t, str) else t[0] for t in targets], answers)

    total_s = [t["total_s"] for t in timers if t["total_s"]]
    serving = {"p50_total_s": float(np.median(total_s)) if total_s else None,
               "n_examples": len(per_example)}
    return EvalResult(task_scores=scores, per_example=per_example, serving=serving)
