"""Parameter partition specs: rule-based TP + FSDP shardings for all model pytrees.

The reference shards nothing at 7B scale (single-GPU fit + DeepSpeed ZeRO for training,
SURVEY.md §2.9); here TP/FSDP are free via pjit once specs are right. Rules are keyed on
pytree paths. Scan-stacked layer params have a leading layer axis (never sharded).

TP layout (standard Megatron-style, collectives ride ICI):
- attention q/k/v: output (heads) dim on "model"; o: input dim on "model"
- MLP gate/up: output (ffn) dim on "model"; down: input dim on "model"
- embed + lm_head: vocab dim on "model" (logits all-gathered)
FSDP: the largest remaining dim shards over "fsdp".
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_flamingo_tpu.parallel.mesh import make_mesh


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def _spec_for(path: str, ndim: int, stacked: bool) -> P:
    """Partition spec for one param. `stacked` = leading scan-layer axis present."""

    def with_lead(*dims):
        dims = list(dims)
        # pad to ndim
        while len(dims) < ndim - (1 if stacked else 0):
            dims.insert(0, None)
        if stacked:
            dims.insert(0, None)
        return P(*dims)

    # attention projections
    if any(f"/{n}/w" in "/" + path for n in ("q", "k", "v")):
        return with_lead("fsdp", "model")          # [d_in, heads*hd]
    if path.endswith("o/w"):
        return with_lead("model", "fsdp")          # [heads*hd, d_out]
    if any(path.endswith(s) for s in ("mlp/gate", "mlp/up", "fc1/w")):
        return with_lead("fsdp", "model")          # [d, ffn]
    if any(path.endswith(s) for s in ("mlp/down", "fc2/w")):
        return with_lead("model", "fsdp")          # [ffn, d]
    if path.endswith("embed") or path.endswith("lm_head"):
        # embed [vocab, d] / lm_head [d, vocab]
        return with_lead("model", "fsdp") if path.endswith("embed") else with_lead("fsdp", "model")
    if path.endswith("pos_embed") or path.endswith("pos"):
        return with_lead(None, "fsdp")
    # conv stems, biases, norms, small vectors: replicate
    return P()


def param_specs(params, stacked_key: str = "layers"):
    """Pytree of PartitionSpec matching `params`."""

    def fn(path, leaf):
        p = _path_str(path)
        stacked = f"{stacked_key}/" in p or p.startswith(stacked_key)
        return _spec_for(p, leaf.ndim, stacked)

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_params(params, mesh: Mesh | None = None):
    """Place params onto the mesh with TP/FSDP shardings. Returns (params, specs)."""
    mesh = mesh or make_mesh()
    specs = param_specs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    placed = jax.device_put(params, shardings)
    return placed, specs
