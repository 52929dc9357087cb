"""YAML training configs: dataset mixtures + stage + run settings from one file.

Parity with the reference's config surface (SURVEY.md §5 config row: AF1/AF2 YAML mixture
configs; AF3 TrainingArguments + bash). One `train.yaml` drives `python -m
audio_flamingo_tpu.cli train --config train.yaml`-style runs:

```yaml
stage: 1_pretrain            # or mf_1_full_ft ...
batch_size: 8
num_steps: 10000
ckpt_dir: /ckpts/af3-stage1
model:
  preset: tiny               # tiny | af3_7b (or full nested overrides)
mixture:
  - jsonl: /data/audioskills.jsonl
    audio_root: /data/audio
    weight: 3.0
  - tar_shards: ["/data/shard-{000..009}.tar"]
    weight: 1.0
```
"""

from __future__ import annotations

import glob as globlib
from dataclasses import dataclass

import yaml

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.train.data import MixtureSampler, Source
from audio_flamingo_tpu.train.loop import TrainRunConfig


def _expand_braces(pattern: str) -> list[str]:
    """shard-{000..009}.tar brace ranges (webdataset convention)."""
    import re

    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if not m:
        return sorted(globlib.glob(pattern)) or [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    return [pattern[: m.start()] + str(i).zfill(width) + pattern[m.end():]
            for i in range(int(lo), int(hi) + 1)]


def load_train_config(path: str):
    """-> (AF3Config, TrainRunConfig, MixtureSampler factory)."""
    with open(path) as f:
        raw = yaml.safe_load(f)

    preset = (raw.get("model") or {}).get("preset", "tiny")
    if preset == "tiny":
        model_cfg = AF3Config.tiny()
    elif preset == "af3_7b":
        model_cfg = AF3Config()
    else:
        raise ValueError(f"unknown model preset {preset!r}")

    run_cfg = TrainRunConfig(
        stage=raw.get("stage", "1_pretrain"),
        batch_size=int(raw.get("batch_size", 2)),
        num_steps=int(raw.get("num_steps", 100)),
        log_every=int(raw.get("log_every", 10)),
        ckpt_every=int(raw.get("ckpt_every", 500)),
        ckpt_dir=raw.get("ckpt_dir"),
    )

    def make_sampler(seed: int = 0) -> MixtureSampler:
        from audio_flamingo_tpu.train.sources import JsonlSource, TarShardSource

        sources: list[Source] = []
        for entry in raw.get("mixture", []):
            weight = float(entry.get("weight", 1.0))
            if "jsonl" in entry:
                sources.append(JsonlSource(entry["jsonl"],
                                           audio_root=entry.get("audio_root", ""),
                                           weight=weight,
                                           name=entry.get("name")).source())
            elif "tar_shards" in entry:
                shards = []
                for pat in entry["tar_shards"]:
                    shards.extend(_expand_braces(pat))
                sources.append(TarShardSource(shards, weight=weight,
                                              name=entry.get("name", "tar")).source())
            else:
                raise ValueError(f"mixture entry needs 'jsonl' or 'tar_shards': {entry}")
        assert sources, "empty mixture"
        return MixtureSampler(sources, seed=seed)

    return model_cfg, run_cfg, make_sampler
