"""Sharded training step: optax + stage freeze masks + pjit over the mesh.

Replaces the reference's HF-Trainer + DeepSpeed ZeRO loop (SURVEY.md §3.3): gradients are
averaged by XLA (the batch axis is sharded over data/fsdp, so the loss mean IS the
all-reduce), optimizer states inherit parameter shardings (ZeRO-equivalent), and freeze
masks implement the stage curriculum (train/stages.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.train.stages import Stage, trainable_mask


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(stage: Stage, params, *, weight_decay: float = 0.01,
                   warmup_steps: int = 100, total_steps: int = 10_000,
                   grad_clip: float = 1.0,
                   lora_only: bool = False) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, stage.lr, warmup_steps, max(total_steps, warmup_steps + 1), stage.lr * 0.1)
    mask = trainable_mask(params, stage)
    if lora_only:
        # parameter-efficient fine-tuning (ops/lora.py): only adapter leaves
        # train; the stage mask still gates them (a frozen-LM stage trains no
        # LM adapters either)
        from audio_flamingo_tpu.ops.lora import lora_mask

        mask = jax.tree.map(lambda a, b: a and b, mask, lora_mask(params))
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )
    # frozen leaves get zero updates AND carry no optimizer state (ZeRO-friendly memory)
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )


def init_state(params, stage: Stage, **opt_kwargs) -> tuple[TrainState, optax.GradientTransformation]:
    opt = make_optimizer(stage, params, **opt_kwargs)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)), opt


def train_step(state: TrainState, batch: dict, *, cfg: AF3Config,
               opt: optax.GradientTransformation, compute_dtype=jnp.bfloat16,
               sp_mesh=None, sp_axis: str = "model", sp_attn: str = "ring",
               accum_steps: int = 1, ce_chunk: int = 0):
    """One step. batch: {'ids': [B,T], 'labels': [B,T], 'mels': [B,W,F,M] | None}.

    Pure function of (state, batch) — jit/pjit it with donated state. Under a sharded
    batch axis the loss mean already averages across devices (XLA inserts the psum).

    sp_mesh: if given, the LM forward runs SEQUENCE-PARALLEL over `sp_axis` of that
    mesh (af3.loss_sp — ring/Ulysses attention, O(T/sp) activation memory/device) for
    context-extension stages (AF3 stage 3.5 / MF full-song, SURVEY.md §2.9 SP row).
    Freeze masks apply unchanged (they live in the optimizer, not the loss).

    accum_steps: gradient accumulation — the batch axis is split into `accum_steps`
    microbatches processed by a `lax.scan` (activation memory drops by that factor;
    compose with cfg.lm.remat for the stage-3.5 memory budget). Gradients are summed
    UNNORMALIZED and divided by the GLOBAL valid-token count, so the result equals the
    full-batch loss exactly (not an average of per-microbatch means) — the DeepSpeed
    micro_batch_per_gpu role (SURVEY.md §3.3).
    """

    def terms_fn(params, mb):
        if sp_mesh is not None:
            return af3.loss_sp_terms(params, cfg, mb["ids"], mb["labels"],
                                     mb.get("mels"), mesh=sp_mesh, axis=sp_axis,
                                     attn_impl=sp_attn, compute_dtype=compute_dtype)
        return af3.loss_terms(params, cfg, mb["ids"], mb["labels"], mb.get("mels"),
                              compute_dtype=compute_dtype, ce_chunk=ce_chunk)

    if accum_steps == 1:
        def loss_fn(params):
            nll_sum, count = terms_fn(params, batch)
            return nll_sum / jnp.maximum(count, 1)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
    else:
        b = batch["ids"].shape[0]
        assert b % accum_steps == 0, (b, accum_steps)
        micro = {k: v.reshape(accum_steps, b // accum_steps, *v.shape[1:])
                 for k, v in batch.items() if v is not None}

        def nll_fn(params, mb):
            nll_sum, count = terms_fn(params, mb)
            return nll_sum, count

        def body(carry, mb):
            gsum, ssum, csum = carry
            (s, c), g = jax.value_and_grad(nll_fn, has_aux=True)(state.params, mb)
            # accumulate in f32 regardless of param dtype: bf16 accumulators round
            # to 8 mantissa bits per add and drift from the full-batch gradient
            gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), gsum, g)
            return (gsum, ssum + s, csum + c), None

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (gsum, ssum, csum), _ = jax.lax.scan(
            body, (zeros, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), micro)
        denom = jnp.maximum(csum, 1).astype(jnp.float32)
        grads = jax.tree.map(lambda g, p: (g / denom).astype(p.dtype),
                             gsum, state.params)
        loss = ssum / denom

    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    return TrainState(params, opt_state, state.step + 1), metrics


def make_jit_train_step(cfg: AF3Config, opt, mesh=None, state_sharding=None,
                        batch_sharding=None, compute_dtype=jnp.bfloat16,
                        sp: bool = False, sp_axis: str = "model", sp_attn: str = "ring",
                        accum_steps: int = 1, ce_chunk: int = 0):
    """Compiled train step; with a mesh, in/out shardings pin params/opt-state placement.

    sp=True (requires mesh): run the LM forward sequence-parallel over `sp_axis`."""
    step = partial(train_step, cfg=cfg, opt=opt, compute_dtype=compute_dtype,
                   sp_mesh=(mesh if sp else None), sp_axis=sp_axis, sp_attn=sp_attn,
                   accum_steps=accum_steps, ce_chunk=ce_chunk)
    if mesh is None:
        assert not sp, "sequence parallelism needs a mesh"
        return jax.jit(step, donate_argnums=0)
    return jax.jit(step, donate_argnums=0,
                   in_shardings=(state_sharding, batch_sharding),
                   out_shardings=(state_sharding, None))
