"""Training data pipeline: weighted dataset mixtures -> static-shape packed batches.

Behavior reference (SURVEY.md §2.8): AF1/AF2 branches mix datasets with per-source
weights from YAML configs; AF3 (VILA lineage) mixes via llava/data dataset registries;
AF1 builds interleaved few-shot (ICL) sequences. Here:

- a `Source` yields (audio waveform(s), text) examples;
- `MixtureSampler` draws sources by weight (deterministic per-seed);
- `BatchBuilder` tokenizes through the AF3Processor contract, buckets by window count and
  token length (static shapes for TPU: one compiled train step per bucket), packs labels
  with -100 over prompt/audio positions;
- `icl_interleave` builds AF1-style few-shot sequences with per-example media indices.

Integrates with `grain` when available for prefetch/sharding; the core logic is
dependency-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterator, Sequence

import numpy as np

TOKEN_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)


def bucket_tokens(n: int, buckets: Sequence[int] = TOKEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class Source:
    """One dataset: an example factory + mixing weight."""

    name: str
    weight: float
    examples: Callable[[np.random.Generator], tuple[list[np.ndarray], str, str]]
    """rng -> (audios, prompt_text_with_placeholders, answer_text)"""


class MixtureSampler:
    """Weighted sampling over sources, reproducible per (seed, step)."""

    def __init__(self, sources: Sequence[Source], seed: int = 0):
        assert sources
        self.sources = list(sources)
        w = np.asarray([s.weight for s in sources], np.float64)
        self.probs = w / w.sum()
        self.rng = np.random.default_rng(seed)

    def sample(self):
        idx = int(self.rng.choice(len(self.sources), p=self.probs))
        src = self.sources[idx]
        return src.name, src.examples(self.rng)


@dataclass
class BatchBuilder:
    """Packs processor outputs into fixed-shape training batches.

    Labels follow [hf] modeling_qwen2_audio.py:853-866 semantics: -100 over prompt and
    audio positions, token ids over the answer; right-padded to the token bucket with -100
    and pad_id.
    """

    processor: "object"          # runtime.processor.AF3Processor
    pad_id: int = 0
    max_windows: int = 20

    def build(self, examples: list[tuple[list[np.ndarray], str, str]]) -> dict:
        rows = []
        max_nw = 1
        for audios, prompt, answer in examples:
            pre = self.processor(
                messages=[{"role": "user", "content": prompt}], audios=audios or None)
            prompt_ids = pre["ids"][0]
            ans_ids = np.asarray(self.processor.tokenizer.encode(answer), np.int32)
            eos = self.processor.tokenizer.special_tokens.get("<|im_end|>")
            if eos is not None:
                ans_ids = np.concatenate([ans_ids, [eos]]).astype(np.int32)
            ids = np.concatenate([prompt_ids, ans_ids])
            labels = np.concatenate([np.full(len(prompt_ids), -100, np.int32), ans_ids])
            mels = pre["mels"][0] if pre["mels"] is not None else None
            if mels is not None:
                max_nw = max(max_nw, mels.shape[0])
            rows.append((ids, labels, mels))

        max_nw = min(max_nw, self.max_windows)
        tok_len = bucket_tokens(max(len(r[0]) for r in rows))
        n_mels = self.processor.cfg.encoder.num_mel_bins
        b = len(rows)
        ids = np.full((b, tok_len), self.pad_id, np.int32)
        labels = np.full((b, tok_len), -100, np.int32)
        mels = np.zeros((b, max_nw, 3000, n_mels), np.float32)
        for i, (r_ids, r_labels, r_mels) in enumerate(rows):
            n = min(len(r_ids), tok_len)
            ids[i, :n] = r_ids[:n]
            labels[i, :n] = r_labels[:n]
            if r_mels is not None:
                mels[i, : r_mels.shape[0]] = r_mels[: max_nw]
        return {"ids": ids, "labels": labels, "mels": mels}


def icl_interleave(examples: list[tuple[str, str]], audio_token: str = "<sound>") -> tuple[str, np.ndarray]:
    """AF1 few-shot: interleave (prompt, answer) shots into one sequence.

    Returns (text, media_ordinals) where media_ordinals[i] = number of media items before
    text segment i — feeds ops.xattn.media_mask for Flamingo masking (SURVEY.md §3.2).
    """
    parts = []
    for prompt, answer in examples:
        parts.append(f"{audio_token}{prompt} {answer}".strip())
    return "\n".join(parts), np.arange(1, len(examples) + 1)


def batches(sampler: MixtureSampler, builder: BatchBuilder, batch_size: int) -> Iterator[dict]:
    """Infinite batch stream (host-side; see `prefetch` for pipelined input)."""
    while True:
        rows = [sampler.sample()[1] for _ in range(batch_size)]
        yield builder.build(rows)


def prefetch(it: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Background-thread prefetcher: overlaps host batch building (decode, mel, BPE)
    with device steps — the input-pipeline role grain/DataLoader plays in production."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
