"""Isolate the GRPO update failure: run _token_logp / grad standalone at the
bench shape (1.5B bf16 policy, [4, 1006] ids, real mels).

Run: python scripts/probe_grpo_logp.py  (ONE TPU process at a time)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import adaptor as adaptor_mod
from audio_flamingo_tpu.models import qwen2, whisper_encoder
from audio_flamingo_tpu.train.grpo import GRPOConfig, _token_logp, grpo_loss

enc_cfg = WhisperEncoderConfig(use_flash=True)
lm_cfg = dataclasses.replace(Qwen2Config.qwen25_1_5b(), use_flash=True,
                             remat="full")
cfg = AF3Config(encoder=enc_cfg, lm=lm_cfg)
bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)  # noqa: E731
print("init...", flush=True)
policy = {
    "encoder": bf16(whisper_encoder.init(jax.random.PRNGKey(0), enc_cfg)),
    "adaptor": bf16(adaptor_mod.init(jax.random.PRNGKey(1), enc_cfg.d_model,
                                     lm_cfg.hidden_size)),
    "lm": jax.jit(lambda: bf16(qwen2.init(jax.random.PRNGKey(2), lm_cfg)))(),
}
_ = float(policy["lm"]["ln_f_w"].astype(jnp.float32).sum())
rng = np.random.default_rng(0)
g, t = 4, 1006
ids = np.full((g, t), cfg.audio_token_id, np.int32)
ids[:, 750:] = rng.integers(0, 150_000, (g, t - 750))
ids_j = jnp.asarray(ids)
mels = jnp.asarray((rng.normal(size=(g, 1, 3000, 128)) * 0.1), jnp.float32)

print("1: policy _token_logp fwd...", flush=True)
lp = _token_logp(policy, cfg, ids_j, mels, jnp.bfloat16)
print("   OK", float(lp.sum()), flush=True)

print("2: grad of grpo_loss w.r.t. lm...", flush=True)
gcfg = GRPOConfig(group_size=g, max_new_tokens=64)
gen_mask = jnp.asarray(np.arange(t)[None] >= 942).repeat(g, 0)
adv = jnp.asarray([1.0, -1.0, 0.5, -0.5], jnp.float32)


def lm_loss(lm_p):
    return grpo_loss({**policy, "lm": lm_p}, jax.lax.stop_gradient(lp), cfg,
                     ids_j, mels, gen_mask, adv, lp, gcfg, jnp.bfloat16)


loss, grads = jax.value_and_grad(lm_loss)(policy["lm"])
print("   OK loss", float(loss), "gnorm leaf",
      float(jnp.abs(jax.tree.leaves(grads)[0]).astype(jnp.float32).sum()),
      flush=True)
print("PROBE ALL OK", flush=True)
