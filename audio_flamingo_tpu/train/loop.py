"""Training orchestration: stage-driven loop over mixture batches with checkpoint/resume.

Replaces the reference's deepspeed-launcher + HF-Trainer loop (SURVEY.md §3.3). One
compiled step per (token-bucket, window-bucket) shape; metrics go to the lightweight
registry (utils/metrics.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.train import checkpoints
from audio_flamingo_tpu.train.data import BatchBuilder, MixtureSampler, batches
from audio_flamingo_tpu.train.stages import AF3_STAGES, Stage
from audio_flamingo_tpu.train.train_step import TrainState, init_state, make_jit_train_step
from audio_flamingo_tpu.utils.metrics import MetricsLogger


@dataclass
class TrainRunConfig:
    stage: str = "1_pretrain"
    batch_size: int = 2
    num_steps: int = 100
    log_every: int = 10
    ckpt_every: int = 500
    ckpt_dir: str | None = None
    compute_dtype: object = None  # default bf16 inside train_step


def run(cfg: AF3Config, params, sampler: MixtureSampler, builder: BatchBuilder,
        run_cfg: TrainRunConfig, mesh=None, metrics: MetricsLogger | None = None):
    """Train `params` for num_steps; returns (final TrainState, metrics history)."""
    import jax.numpy as jnp

    stage: Stage = AF3_STAGES[run_cfg.stage]
    state, opt = init_state(params, stage, total_steps=run_cfg.num_steps)
    dtype = run_cfg.compute_dtype or jnp.bfloat16
    step_fn = make_jit_train_step(cfg, opt, mesh=mesh, compute_dtype=dtype)
    metrics = metrics or MetricsLogger()

    start = 0
    if run_cfg.ckpt_dir:
        last = checkpoints.latest_step(run_cfg.ckpt_dir)
        if last is not None:
            state = checkpoints.restore(run_cfg.ckpt_dir, state, step=last)
            start = last

    it = batches(sampler, builder, run_cfg.batch_size)
    t0 = time.time()
    for i, batch in zip(range(start, run_cfg.num_steps), it):
        state, m = step_fn(state, batch)
        if (i + 1) % run_cfg.log_every == 0 or i + 1 == run_cfg.num_steps:
            loss = float(m["loss"])
            gn = float(m["grad_norm"])
            dt = (time.time() - t0) / max(1, (i + 1 - start))
            metrics.log(step=i + 1, loss=loss, grad_norm=gn, s_per_step=dt)
        if run_cfg.ckpt_dir and (i + 1) % run_cfg.ckpt_every == 0:
            checkpoints.save(run_cfg.ckpt_dir, state, step=i + 1)
    if run_cfg.ckpt_dir:
        checkpoints.save(run_cfg.ckpt_dir, state, step=run_cfg.num_steps)
    return state, metrics
