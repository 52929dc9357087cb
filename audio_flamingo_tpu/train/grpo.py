"""GRPO (group-relative policy optimization) for Music Flamingo reasoning scaling.

Reference behavior (SURVEY.md §3.5, static/MF-architecture.png "w/ GRPO + custom
rewards"): sample G chain-of-thought rollouts per prompt with the inference runtime,
score them with custom (music) reward functions, normalize advantages within each group,
and update with a PPO-style clipped token-level objective plus a KL penalty against the
frozen reference policy — no value network.

The rollout reuses runtime/generate.py (decode loop is callable from the trainer —
SURVEY.md §7 hard-parts note); the update reuses the af3 full-sequence forward.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen


@dataclass(frozen=True)
class GRPOConfig:
    group_size: int = 4
    clip_eps: float = 0.2
    kl_coef: float = 0.04
    temperature: float = 1.0
    top_k: int = 0
    max_new_tokens: int = 64


def rollout(params, cfg: AF3Config, token_ids: np.ndarray, mels,
            gcfg: GRPOConfig, eos_token_id: int, rng: jax.Array,
            compute_dtype=jnp.bfloat16):
    """One prompt -> G sampled completions.

    Returns (full_ids [G, T+N], gen_mask [G, T+N] True over generated tokens incl. EOS).
    """
    g = gcfg.group_size
    ids = jnp.tile(jnp.asarray(token_ids), (g, 1))
    mels_t = jnp.tile(jnp.asarray(mels), (g, 1, 1, 1)) if mels is not None else None
    sampling = SamplingParams(greedy=False, temperature=gcfg.temperature, top_k=gcfg.top_k)
    tokens, lengths = gen.generate(params, cfg, ids, mels_t,
                                   max_new_tokens=gcfg.max_new_tokens,
                                   eos_token_id=eos_token_id, sampling=sampling, rng=rng,
                                   compute_dtype=compute_dtype)
    t = ids.shape[1]
    full = jnp.concatenate([ids, tokens], axis=1)
    step_idx = jnp.arange(gcfg.max_new_tokens)[None]
    gen_mask = jnp.concatenate(
        [jnp.zeros((g, t), bool), step_idx < lengths[:, None]], axis=1)
    return full, gen_mask, lengths


def group_advantages(rewards: jnp.ndarray) -> jnp.ndarray:
    """[G] rewards -> group-relative advantages (r - mean) / (std + eps)."""
    mu = rewards.mean()
    sd = rewards.std()
    return (rewards - mu) / (sd + 1e-4)


def _token_logp(params, cfg: AF3Config, ids, mels, compute_dtype):
    """log p(token_t | <t) for every position t>=1: [G, T-1]."""
    logits = af3.logits(params, cfg, ids, mels, compute_dtype=compute_dtype)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    return jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]


@partial(jax.jit, static_argnames=("cfg", "gcfg", "compute_dtype"))
def grpo_loss(params, ref_params, cfg: AF3Config, ids, mels, gen_mask, advantages,
              old_logp, gcfg: GRPOConfig, compute_dtype=jnp.float32):
    """Clipped-ratio policy loss + KL(pi || pi_ref), averaged over generated tokens.

    ids [G, L]; gen_mask [G, L] (True = generated); advantages [G];
    old_logp [G, L-1] token logprobs under the behavior policy (from rollout time).
    """
    logp = _token_logp(params, cfg, ids, mels, compute_dtype)
    mask = gen_mask[:, 1:].astype(jnp.float32)
    ratio = jnp.exp(logp - old_logp)
    adv = advantages[:, None]
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1 - gcfg.clip_eps, 1 + gcfg.clip_eps) * adv
    pg = -jnp.minimum(unclipped, clipped)

    ref_logp = jax.lax.stop_gradient(
        _token_logp(ref_params, cfg, ids, mels, compute_dtype))
    # k3 KL estimator (unbiased, low-variance): e^(ref-logp) - (ref-logp) - 1
    delta = ref_logp - logp
    kl = jnp.exp(delta) - delta - 1.0

    per_tok = pg + gcfg.kl_coef * kl
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per_tok * mask).sum() / denom


def grpo_step(params, ref_params, opt, opt_state, cfg: AF3Config, prompts: Sequence[dict],
              reward_fn: Callable[[list[int]], float], gcfg: GRPOConfig,
              eos_token_id: int, rng: jax.Array, decode_fn: Callable[[list[int]], str],
              compute_dtype=jnp.float32):
    """One GRPO update over a list of prompts ({'ids': [1,T], 'mels': ...}).

    reward_fn scores decoded text (custom music rewards live in the caller).
    Returns (params, opt_state, metrics).
    """
    import optax

    all_grads = None
    total_loss, total_reward = 0.0, 0.0
    for prompt in prompts:
        rng, k = jax.random.split(rng)
        full, gen_mask, lengths = rollout(params, cfg, prompt["ids"], prompt.get("mels"),
                                          gcfg, eos_token_id, k, compute_dtype)
        t = prompt["ids"].shape[1]
        texts = [decode_fn(np.asarray(full[i, t: t + int(lengths[i])]).tolist())
                 for i in range(gcfg.group_size)]
        rewards = jnp.asarray([reward_fn(txt) for txt in texts], jnp.float32)
        adv = group_advantages(rewards)
        mels_t = (jnp.tile(jnp.asarray(prompt["mels"]), (gcfg.group_size, 1, 1, 1))
                  if prompt.get("mels") is not None else None)
        old_logp = jax.lax.stop_gradient(
            _token_logp(params, cfg, full, mels_t, compute_dtype))
        loss, grads = jax.value_and_grad(grpo_loss)(
            params, ref_params, cfg, full, mels_t, gen_mask, adv, old_logp, gcfg,
            compute_dtype)
        all_grads = grads if all_grads is None else jax.tree.map(jnp.add, all_grads, grads)
        total_loss += float(loss)
        total_reward += float(rewards.mean())

    n = len(prompts)
    all_grads = jax.tree.map(lambda g: g / n, all_grads)
    updates, opt_state = opt.update(all_grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": total_loss / n, "mean_reward": total_reward / n}


# ------------------------------------------------------------------ example rewards

def format_reward(think_open: str = "<think>", think_close: str = "</think>"):
    """MF-style format reward: thinking block present and well-formed."""

    def fn(text: str) -> float:
        has_open = think_open in text
        has_close = think_close in text
        ordered = has_open and has_close and text.index(think_open) < text.index(think_close)
        return 1.0 if ordered else (0.25 if (has_open or has_close) else 0.0)

    return fn


def exact_match_reward(answer: str):
    """Correctness reward: 1 if the expected answer appears after the thinking block."""

    def fn(text: str) -> float:
        tail = text.split("</think>")[-1] if "</think>" in text else text
        return 1.0 if answer.strip().lower() in tail.strip().lower() else 0.0

    return fn
