"""grain-based input pipeline: worker-parallel, prefetched example stream.

Production input path (grain is the TPU-stack data loader; the reference uses torch
DataLoader workers). grain parallelizes and prefetches the per-example work (audio
decode, tiling); batch assembly (bucketing, label masks) stays in train/data.BatchBuilder
because bucket choice needs the whole batch. Draws are seeded per index, so the stream is
reproducible regardless of worker count.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class _ExampleSource:
    """grain RandomAccessDataSource over mixture sources (index -> (audios, prompt, ans))."""

    sources: list
    probs: np.ndarray
    seed: int
    virtual_len: int = 1_000_000

    def __len__(self) -> int:
        return self.virtual_len

    def __getitem__(self, idx: int):
        rng = np.random.default_rng((self.seed, int(idx)))
        src = self.sources[int(rng.choice(len(self.sources), p=self.probs))]
        return src.examples(rng)


def grain_batches(sampler, builder, batch_size: int, *, seed: int = 0,
                  worker_count: int = 0, prefetch: int = 8):
    """Iterator of training batches: grain DataLoader examples -> BatchBuilder batches.

    sampler: train.data.MixtureSampler (sources/probs reused; per-index seeding).
    worker_count=0 runs in-process (CI-safe); >0 forks worker processes.
    """
    import grain.python as grain

    source = _ExampleSource(sources=sampler.sources, probs=sampler.probs, seed=seed)
    grain_sampler = grain.IndexSampler(
        num_records=len(source), shard_options=grain.NoSharding(), shuffle=False,
        num_epochs=1, seed=seed)
    loader = grain.DataLoader(
        data_source=source,
        sampler=grain_sampler,
        operations=[],
        worker_count=worker_count,
        read_options=grain.ReadOptions(prefetch_buffer_size=prefetch),
    )
    rows = []
    for example in loader:
        rows.append(example)
        if len(rows) == batch_size:
            yield builder.build(rows)
            rows = []
