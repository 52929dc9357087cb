"""Checkpoint save/restore: orbax for native training state + safetensors export/import.

Replaces the reference's HF-Trainer/DeepSpeed checkpoint machinery (SURVEY.md §5
checkpoint row): async orbax checkpointing with resume, plus a safetensors exporter so
weights interop with the HF ecosystem (the reverse of io/hf_import.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, state, step: int | None = None) -> None:
    """Save a TrainState (or params pytree) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step}" if step is not None else "latest"),
                   state)


def restore(path: str, template, step: int | None = None):
    """Restore into the structure of `template` (same pytree/shapes/dtypes)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    name = f"step_{step}" if step is not None else "latest"
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, name), template)


def latest_step(path: str) -> int | None:
    steps = []
    if os.path.isdir(path):
        for d in os.listdir(path):
            if d.startswith("step_"):
                try:
                    steps.append(int(d.split("_", 1)[1]))
                except ValueError:
                    pass
    return max(steps) if steps else None


def export_safetensors(path: str, params, flatten_sep: str = ".") -> None:
    """Flatten a params pytree to name->array and write one .safetensors file."""
    from audio_flamingo_tpu.io.safetensors import save_safetensors

    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}{flatten_sep}{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(f"{prefix}{flatten_sep}{i}" if prefix else str(i), v)
        else:
            flat[prefix] = np.asarray(node)

    visit("", params)
    save_safetensors(path, flat)


def import_safetensors(path: str, template):
    """Load a flat safetensors file back into the structure of `template`."""
    from audio_flamingo_tpu.io.safetensors import load_safetensors

    flat = load_safetensors(path)

    def build(prefix, node):
        if isinstance(node, dict):
            return {k: build(f"{prefix}.{k}" if prefix else str(k), v)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [build(f"{prefix}.{i}" if prefix else str(i), v)
                   for i, v in enumerate(node)]
            return type(node)(out)
        arr = flat[prefix]
        return jax.numpy.asarray(arr).astype(node.dtype).reshape(node.shape)

    return build("", template)


class AsyncCheckpointer:
    """Async (non-blocking) checkpointing for the training loop (SURVEY.md §5 failure
    detection row: orbax async checkpointing + resume). Saves overlap the next steps;
    call wait()/close() before exit."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state, step: int) -> None:
        from orbax.checkpoint import args as ocp_args

        self._ckptr.save(os.path.join(os.path.abspath(path), f"step_{step}"),
                         ocp_args.StandardSave(state))

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
