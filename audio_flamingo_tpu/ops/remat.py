"""Activation-recompute (gradient checkpointing) policies for scan-stacked layers.

TPU-native replacement for the reference lineage's DeepSpeed activation checkpointing
(SURVEY.md §2.8/§2.9: AF3/VILA trains long-context with activation checkpointing; the
capability is attested by /root/reference/README.md:47 "extended context" and :109
10-min inputs). With `jax.lax.scan` over L layers the backward pass saves every layer's
residual stream — O(L * B * T * d) HBM. Wrapping the scan BODY in `jax.checkpoint`
bounds that at one layer's activations (policy "full") or one layer's matmul outputs
(policy "dots" — recompute elementwise/norm ops, keep MXU outputs).

Policies:
  "none"  — save everything (fastest backward, most memory)
  "dots"  — `dots_with_no_batch_dims_saveable`: keep matmul results, recompute the rest.
            Good default: ~L x reduction on residuals at <10% step-time cost.
  "full"  — save only layer inputs; recompute the whole layer in backward. Max memory
            savings (the stage-3.5 / full-song setting), ~30% step-time cost.

`prevent_cse=False` is the documented-safe setting inside scan/while bodies (XLA cannot
hoist across loop iterations), avoiding the defensive CSE-blocking that slows compile.
"""

from __future__ import annotations

import jax

REMAT_POLICIES = ("none", "dots", "full")


def remat_wrap(body, remat: str):
    """Wrap a scan body (or any per-layer function) per the policy name."""
    if remat == "none":
        return body
    if remat == "dots":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            prevent_cse=False)
    if remat == "full":
        return jax.checkpoint(body, prevent_cse=False)
    raise ValueError(f"remat must be one of {REMAT_POLICIES}, got {remat!r}")
