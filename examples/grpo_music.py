"""Example: Music Flamingo GRPO reasoning scaling (stage mf_3_grpo).

Runs a few GRPO updates with the MF-style rewards (format + correctness) on a tiny
random model — swap in api.load(...) params and real (audio, question, answer) triples.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import


import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_flamingo_tpu.api import AudioFlamingo
from audio_flamingo_tpu.train.grpo import (
    GRPOConfig,
    exact_match_reward,
    format_reward,
    grpo_step,
)

model = AudioFlamingo.from_random(compute_dtype=jnp.float32)
params = jax.tree.map(jnp.copy, model.params)
ref_params = jax.tree.map(jnp.copy, model.params)  # frozen KL reference

fmt = format_reward()
em = exact_match_reward("blues")


def reward_fn(text: str) -> float:
    return 0.5 * fmt(text) + 0.5 * em(text)


def decode_fn(token_ids):
    return model.processor.tokenizer.decode(token_ids, skip_special=True)


prompt = model.processor(messages=[{
    "role": "user",
    "content": "What genre is this song? Think first, then answer.",
}])
prompts = [{"ids": prompt["ids"], "mels": None}]

opt = optax.adam(1e-5)
opt_state = opt.init(params)
gcfg = GRPOConfig(group_size=4, max_new_tokens=24, temperature=1.0, kl_coef=0.04)
rng = jax.random.PRNGKey(0)
for step in range(3):
    rng, k = jax.random.split(rng)
    params, opt_state, metrics = grpo_step(
        params, ref_params, opt, opt_state, model.cfg, prompts, reward_fn, gcfg,
        model.eos_token_id, k, decode_fn, compute_dtype=jnp.float32)
    print(f"step {step}: loss={metrics['loss']:.4f} mean_reward={metrics['mean_reward']:.3f}")
