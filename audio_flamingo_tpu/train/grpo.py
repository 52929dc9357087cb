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
from functools import lru_cache, partial
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


def make_engine_rollout(engine):
    """Rollouts through a serving engine (runtime.paged_engine.PagedEngine or
    runtime.engine.BatchEngine): G samples of one prompt ride the engine as G
    concurrently-batched requests — the batched decode loop is GRPO's hot path
    for long-form music rollouts (SURVEY.md §3.5; VERDICT r3 #4). Per-row rngs
    decorrelate the group; with prefix_cache=True the shared prompt (and its
    encoder ride) prefills once and the other G-1 rows reuse the pages.

    The engine holds a params REFERENCE; `grpo_step` keeps it on-policy
    automatically (entry + post-update sync via `_sync_engine_policy` — same
    shapes, leaf reassignment, no recompile). Callers driving the engine
    outside grpo_step should still assign `engine.params = new_params` after
    updates. Returned callable matches `rollout`'s (full_ids, gen_mask,
    lengths) contract and plugs into `grpo_step(rollout_fn=...)`."""
    import itertools

    from audio_flamingo_tpu.runtime.engine import Request

    counter = itertools.count()

    def fn(token_ids: np.ndarray, mels, gcfg: GRPOConfig, eos_token_id: int):
        g = gcfg.group_size
        sampling = SamplingParams(greedy=False, temperature=gcfg.temperature,
                                  top_k=gcfg.top_k)
        ids_np = np.asarray(token_ids)
        rids = []
        for _ in range(g):
            rid = f"grpo{next(counter)}"
            rids.append(rid)
            engine.submit(Request(
                request_id=rid, ids=ids_np,
                mels=None if mels is None else np.asarray(mels),
                max_new_tokens=gcfg.max_new_tokens, sampling=sampling))
        results = engine.run_until_done()
        t = ids_np.shape[1]
        n = gcfg.max_new_tokens
        full = np.tile(ids_np, (g, 1))
        full = np.concatenate([full, np.full((g, n), eos_token_id, np.int32)], 1)
        gen_mask = np.zeros((g, t + n), bool)
        lengths = np.zeros((g,), np.int32)
        for i, rid in enumerate(rids):
            toks = results[rid][:n]
            full[i, t: t + len(toks)] = toks
            gen_mask[i, t: t + len(toks)] = True
            lengths[i] = len(toks)
        return jnp.asarray(full), jnp.asarray(gen_mask), jnp.asarray(lengths)

    fn.engine = engine   # grpo_step syncs engine.params to the policy tree
    return fn


def _sync_engine_policy(rollout_fn, policy) -> None:
    """Keep an engine-backed rollout_fn sampling the CURRENT policy.

    make_engine_rollout samples from engine.params while grpo_step computes
    old_logp under the policy tree — a stale engine would silently treat
    off-policy samples as on-policy (ratio pinned to 1, clipping never
    engages; ADVICE r4 #4). Same-layout trees are refreshed in place (leaf
    assignment, no recompile); a differently-structured engine tree (e.g. an
    int8-quantized serving copy) cannot be refreshed here and raises — such
    callers should requantize after each update and pass a plain callable
    (without the .engine attribute) to opt out of the sync."""
    eng = getattr(rollout_fn, "engine", None)
    if eng is None:
        return
    e_leaves, e_def = jax.tree.flatten(eng.params)
    p_leaves, p_def = jax.tree.flatten(policy)
    if all(a is b for a, b in zip(e_leaves, p_leaves)) and e_def == p_def:
        return
    if e_def != p_def:
        raise ValueError(
            "make_engine_rollout: engine.params tree layout differs from the "
            "policy (quantized serving copy?) — grpo_step cannot keep it "
            "on-policy; requantize engine.params after each update and pass "
            "a callable without an .engine attribute to opt out.")
    eng.params = policy


def group_advantages(rewards: jnp.ndarray) -> jnp.ndarray:
    """[G] rewards -> group-relative advantages (r - mean) / (std + eps)."""
    mu = rewards.mean()
    sd = rewards.std()
    return (rewards - mu) / (sd + 1e-4)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "chunk"))
def _token_logp(params, cfg: AF3Config, ids, mels, compute_dtype,
                chunk: int = 256):
    """log p(token_t | <t) for every position t>=1: [G, T-1]. Jitted: it is
    dispatched standalone for old_logp at rollout time (an eager full-sequence
    forward would dispatch per-op through the device tunnel).

    The unembed + log-softmax run `chunk` positions at a time inside a remat'd
    scan (the af3 ce_chunk pattern): at GRPO shapes the full [G, T, 152k] f32
    logits tensor is ~4.3 GB and is needed for BOTH the policy and the frozen
    reference — materializing it HBM-OOMs the update step."""
    b, t = ids.shape
    x = af3.build_input_embeds(params, cfg, ids, mels, compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    h, _ = qwen2.forward(params["lm"], cfg.lm, x, pos)
    hs = h[:, :-1]
    tgt = ids[:, 1:]
    n = t - 1
    pad = (-n) % chunk
    if pad:
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        tgt = jnp.pad(tgt, ((0, 0), (0, pad)))
    nchunks = (n + pad) // chunk
    hs = hs.reshape(b, nchunks, chunk, -1).transpose(1, 0, 2, 3)
    tgt = tgt.reshape(b, nchunks, chunk).transpose(1, 0, 2)

    from audio_flamingo_tpu.ops.remat import remat_wrap

    def body(carry, xs):
        hc, tc = xs
        lg = qwen2.unembed(params["lm"], cfg.lm, hc)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        return carry, jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]

    _, out = jax.lax.scan(remat_wrap(body, "full"), jnp.zeros(()), (hs, tgt))
    return out.transpose(1, 0, 2).reshape(b, n + pad)[:, :n]


@partial(jax.jit, static_argnames=("cfg", "gcfg", "compute_dtype"))
def grpo_loss(params, ref_logp, cfg: AF3Config, ids, mels, gen_mask, advantages,
              old_logp, gcfg: GRPOConfig, compute_dtype=jnp.float32):
    """Clipped-ratio policy loss + KL(pi || pi_ref), averaged over generated tokens.

    ids [G, L]; gen_mask [G, L] (True = generated); advantages [G];
    old_logp [G, L-1] token logprobs under the behavior policy (from rollout
    time); ref_logp [G, L-1] token logprobs under the FROZEN reference —
    precomputed by the caller with `_token_logp(ref_params, ...)`. The
    reference forward carries no gradients, so keeping it inside the
    differentiated program only doubled that program's size (encoder + LM +
    chunked-logp subgraphs twice plus the policy backward), which is what the
    remote compile service choked on at the 1.5B bench shape.
    """
    logp = _token_logp(params, cfg, ids, mels, compute_dtype)
    mask = gen_mask[:, 1:].astype(jnp.float32)
    ratio = jnp.exp(logp - old_logp)
    adv = advantages[:, None]
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1 - gcfg.clip_eps, 1 + gcfg.clip_eps) * adv
    pg = -jnp.minimum(unclipped, clipped)

    # k3 KL estimator (unbiased, low-variance): e^(ref-logp) - (ref-logp) - 1
    delta = jax.lax.stop_gradient(ref_logp) - logp
    kl = jnp.exp(delta) - delta - 1.0

    per_tok = pg + gcfg.kl_coef * kl
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per_tok * mask).sum() / denom


def grpo_step(params, ref_params, opt, opt_state, cfg: AF3Config, prompts: Sequence[dict],
              reward_fn: Callable[[list[int]], float], gcfg: GRPOConfig,
              eos_token_id: int, rng: jax.Array, decode_fn: Callable[[list[int]], str],
              compute_dtype=jnp.float32, rollout_fn=None,
              trainable: str | None = None, offload_pool: bool = False):
    """One GRPO update over a list of prompts ({'ids': [1,T], 'mels': ...}).

    reward_fn scores decoded text (custom music rewards live in the caller).
    rollout_fn: optional `make_engine_rollout(engine)` callable — long-form
    rollouts then ride the batched serving engine instead of bare generate.
    trainable="lm": differentiate ONLY params['lm'] (the MF GRPO stage freezes
    encoder+adaptor, train/stages.py mf_3_grpo) — opt/opt_state then live on
    the LM subtree. Besides matching the stage semantics, this lets XLA drop
    the encoder backward entirely; with audio prompts at G=8 the un-remat'd
    encoder backward alone exceeds one chip's HBM (measured 38.6 GB ask).
    offload_pool=True: rollout and update are strictly SEQUENTIAL, so with an
    engine-backed rollout_fn the page pool is swapped to host RAM for the
    update phase and restored after — on one 16 GB chip the G=8 update's
    grads + chunked logp do not fit NEXT TO serving pages (VERDICT r4 #5).
    All rollouts then run first (one engine phase), then all grads.
    Returns (params, opt_state, metrics).
    """
    # ---- phase 1: rollouts + rewards (engine pool resident) ----
    if rollout_fn is not None:
        _sync_engine_policy(rollout_fn, params)
    rollouts = []
    for prompt in prompts:
        rng, k = jax.random.split(rng)
        if rollout_fn is not None:
            full, gen_mask, lengths = rollout_fn(prompt["ids"], prompt.get("mels"),
                                                 gcfg, eos_token_id)
        else:
            full, gen_mask, lengths = rollout(params, cfg, prompt["ids"],
                                              prompt.get("mels"), gcfg,
                                              eos_token_id, k, compute_dtype)
        rollouts.append((prompt, full, gen_mask, lengths))

    eng = getattr(rollout_fn, "engine", None)
    swapped = False
    if offload_pool and eng is not None and hasattr(eng, "offload_pool"):
        eng.offload_pool()
        swapped = True
    try:
        params, opt_state, metrics = _grpo_update(
            params, ref_params, opt, opt_state, cfg, rollouts, reward_fn,
            gcfg, decode_fn, compute_dtype, trainable)
    finally:
        if swapped:
            eng.restore_pool()
    if rollout_fn is not None:
        _sync_engine_policy(rollout_fn, params)   # next rollouts: new policy
    return params, opt_state, metrics


def _grpo_update(params, ref_params, opt, opt_state, cfg, rollouts, reward_fn,
                 gcfg, decode_fn, compute_dtype, trainable):
    """Phase 2 of grpo_step: rewards -> advantages -> PPO-clip grads -> apply."""
    import optax

    all_grads = None
    total_loss, total_reward = 0.0, 0.0
    for prompt, full, gen_mask, lengths in rollouts:
        t = prompt["ids"].shape[1]
        texts = [decode_fn(np.asarray(full[i, t: t + int(lengths[i])]).tolist())
                 for i in range(gcfg.group_size)]
        rewards = jnp.asarray([reward_fn(txt) for txt in texts], jnp.float32)
        adv = group_advantages(rewards)
        mels_t = (jnp.tile(jnp.asarray(prompt["mels"]), (gcfg.group_size, 1, 1, 1))
                  if prompt.get("mels") is not None else None)
        old_logp = jax.lax.stop_gradient(
            _token_logp(params, cfg, full, mels_t, compute_dtype))
        # reference logp OUTSIDE the differentiated program (grpo_loss
        # docstring): it carries no gradients
        ref_logp = jax.lax.stop_gradient(
            _token_logp(ref_params, cfg, full, mels_t, compute_dtype))
        if trainable == "lm":
            def lm_loss(lm_p):
                return grpo_loss({**params, "lm": lm_p}, ref_logp, cfg, full,
                                 mels_t, gen_mask, adv, old_logp, gcfg,
                                 compute_dtype)

            loss, grads = jax.value_and_grad(lm_loss)(params["lm"])
        else:
            loss, grads = jax.value_and_grad(grpo_loss)(
                params, ref_logp, cfg, full, mels_t, gen_mask, adv, old_logp,
                gcfg, compute_dtype)
        all_grads = grads if all_grads is None else jax.tree.map(jnp.add, all_grads, grads)
        total_loss += float(loss)
        total_reward += float(rewards.mean())

    n = len(rollouts)
    all_grads = jax.tree.map(lambda g: g / n, all_grads)
    # grads AND the updated subtree are donated: apply_updates otherwise holds
    # old params + updates + new params live at once (~3x the LM bytes at the
    # 1.5B bench shape). Callers must use the RETURNED params — the old lm
    # leaves are invalidated by donation. If ref_params ALIASES any leaf of
    # the donated subtree (e.g. a frozen-reference tree built by sharing the
    # policy's own leaves), donation would delete the reference's buffers out
    # from under the next iteration — detect that and fall back to the
    # non-donating eager apply (pays the 3x transient, stays correct).
    donated = params["lm"] if trainable == "lm" else params
    ref_ids = {id(l) for l in jax.tree.leaves(ref_params)}
    if any(id(l) in ref_ids for l in jax.tree.leaves(donated)):
        updates, opt_state = opt.update(all_grads, opt_state, donated)
        new_sub = optax.apply_updates(donated, updates)
    else:
        new_sub, opt_state = _donating_apply(opt)(all_grads, opt_state, donated)
    params = ({**params, "lm": new_sub} if trainable == "lm" else new_sub)
    return params, opt_state, {"loss": total_loss / n, "mean_reward": total_reward / n}


@lru_cache(maxsize=8)
def _donating_apply(opt):
    """jitted (grads, opt_state, params) -> (new_params, new_opt_state) with
    grads+params donated (optax GradientTransformations are hashable
    NamedTuples, so the jit caches per optimizer across grpo_step calls)."""
    import optax

    def apply(grads, opt_state, p):
        updates, new_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_state

    return jax.jit(apply, donate_argnums=(0, 2))


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
