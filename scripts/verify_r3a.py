"""Round-3 verify: drive the public package surface on the real TPU chip.
Covers: mel frontend, tiny-AF3 wav->text generate, remat-enabled train step,
grad accumulation, engine decode with repetition penalty + ngram."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices())

import dataclasses
from audio_flamingo_tpu.config import AF3Config, MelConfig
from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.ops.sampling import SamplingParams

# 1) mel frontend: 440 Hz tone peaks in a stable bin
fe = WhisperMelFrontend(MelConfig(num_mel_bins=128))
t = np.arange(16000 * 30) / 16000
wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
mels = np.asarray(fe(fe.pad_or_trim(wav)))
peak = mels[0].mean(axis=0).argmax()
print("mel shape", mels.shape, "peak bin", peak)
assert mels.shape[1] == 3000 and 10 < peak < 30

# 2) tiny AF3 wav->text greedy generate, deterministic
cfg = AF3Config.tiny()
params = af3.init(jax.random.PRNGKey(0), cfg)
tpw = af3.tokens_per_window(cfg)
ids = np.concatenate([np.full((1, tpw), cfg.audio_token_id), np.arange(1, 9)[None]], axis=1).astype(np.int32)
m = np.random.default_rng(0).normal(size=(1, 1, 3000, cfg.encoder.num_mel_bins)).astype(np.float32) * 0.1
o1, l1 = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(m), max_new_tokens=8, eos_token_id=199, capacity=1024)
o2, l2 = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(m), max_new_tokens=8, eos_token_id=199, capacity=1024)
o1, o2 = np.asarray(o1), np.asarray(o2)
print("generate:", o1[0].tolist())
assert (o1 == o2).all() and (o1 >= 0).all() and (o1 < cfg.lm.vocab_size).all()

# 3) remat train step + grad accumulation on TPU
from audio_flamingo_tpu.train.train_step import init_state, make_jit_train_step
from audio_flamingo_tpu.train.stages import AF3_STAGES
cfg_r = dataclasses.replace(cfg, lm=dataclasses.replace(cfg.lm, remat="full"),
                            encoder=dataclasses.replace(cfg.encoder, remat="dots"))
batch = {"ids": jnp.asarray(np.tile(ids, (4, 1))),
         "labels": jnp.asarray(np.tile(ids, (4, 1))),
         "mels": jnp.asarray(np.tile(m, (4, 1, 1, 1)))}
st, opt = init_state(jax.tree.map(jnp.copy, params), AF3_STAGES["3_full_ft"], warmup_steps=1, total_steps=10)
step = make_jit_train_step(cfg_r, opt, compute_dtype=jnp.float32, accum_steps=2)
st2, metr = step(st, batch)
st_b, opt_b = init_state(jax.tree.map(jnp.copy, params), AF3_STAGES["3_full_ft"], warmup_steps=1, total_steps=10)
base = make_jit_train_step(cfg, opt_b, compute_dtype=jnp.float32)
st_base, metr_b = base(st_b, batch)
print("train loss remat+accum:", float(metr["loss"]), "dense:", float(metr_b["loss"]))
assert abs(float(metr["loss"]) - float(metr_b["loss"])) < 1e-3

# 4) engine with repetition penalty + ngram on TPU == single-request generate
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request
s = SamplingParams(greedy=True, repetition_penalty=1.3, no_repeat_ngram_size=2)
eng = BatchEngine(params=params, cfg=cfg, num_slots=2, capacity=1024, chunk=4,
                  eos_token_id=199, sampling=SamplingParams(greedy=True))
eng.submit(Request(request_id="a", ids=ids, mels=m, max_new_tokens=8, sampling=s))
res = eng.run_until_done()
ref_t, ref_l = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(m), max_new_tokens=8,
                            eos_token_id=199, capacity=1024, sampling=s)
ref = [int(x) for x in np.asarray(ref_t)[0][:int(ref_l[0])]]
got = res["a"]
n = min(len(ref), len(got))
print("engine:", got, "ref:", ref)
assert got[:n] == ref[:n]
print("VERIFY_OK")
