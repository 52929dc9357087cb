"""Profiling/tracing utilities (SURVEY.md §5 tracing row).

jax.profiler traces (TensorBoard-compatible) + lightweight phase timers for the
frontend/encode/prefill/decode breakdown. Debug knobs: `enable_nan_checks` wires
jax_debug_nans for CI (SURVEY.md §5 race-detection row — JAX is deterministic by
construction; NaN checks are the remaining runtime hazard).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for marking phases inside a trace."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class PhaseTimer:
    """Wall-clock per-phase accumulator; `block=True` syncs the device per phase."""

    block: bool = True
    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if self.block and out.get("result") is not None:
                jax.block_until_ready(out["result"])
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": v, "mean_s": v / max(self.counts[k], 1),
                    "count": self.counts[k]} for k, v in self.totals.items()}


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
