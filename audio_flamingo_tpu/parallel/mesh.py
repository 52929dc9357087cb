"""Device mesh abstraction: one mesh, used identically for train and serve.

Replaces the reference's NCCL/DeepSpeed process groups (SURVEY.md §2.9) with XLA
collectives over ICI emitted by pjit/shard_map. Axes:

- "data":  pure data parallelism (batch / encoder windows)
- "fsdp":  ZeRO-style parameter+optimizer sharding (also carries batch)
- "model": tensor parallelism (attention heads / FFN)

Batch-like arrays shard over ("data", "fsdp"); weights shard over ("fsdp", "model").
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "model")


@dataclass(frozen=True)
class MeshPlan:
    data: int = 1
    fsdp: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp * self.model

    @staticmethod
    def auto(n_devices: int | None = None) -> "MeshPlan":
        """Default layout for n devices: TP up to 4 (v5e ICI-friendly), rest FSDP."""
        n = n_devices if n_devices is not None else jax.device_count()
        model = 1
        for cand in (4, 2, 1):
            if n % cand == 0 and cand <= n:
                model = cand
                break
        fsdp = n // model
        return MeshPlan(data=1, fsdp=fsdp, model=model)


def make_mesh(plan: MeshPlan | None = None, devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    plan = plan or MeshPlan.auto(devs.size)
    assert plan.num_devices == devs.size, (plan, devs.size)
    return Mesh(devs.reshape(plan.data, plan.fsdp, plan.model), AXES)


def batch_spec() -> P:
    """Sharding for batch-like leading axes (tokens, mels, caches)."""
    return P(("data", "fsdp"))


def named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
