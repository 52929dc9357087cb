"""Example: batched serving with the continuous-batching engine.

python examples/serve.py  (random tiny model; swap in api.load(...) for real weights)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import


import numpy as np

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.api import AudioFlamingo
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request

model = AudioFlamingo.from_random(compute_dtype=jnp.float32)
engine = BatchEngine(params=model.params, cfg=model.cfg, num_slots=4, capacity=2048,
                     chunk=16, eos_token_id=model.eos_token_id,
                     sampling=SamplingParams(greedy=True),
                     compute_dtype=jnp.float32)

for i in range(8):
    batch = model.processor(messages=[{"role": "user", "content": f"request {i}?"}])
    engine.submit(Request(request_id=f"req-{i}", ids=batch["ids"], max_new_tokens=32))

results = engine.run_until_done()
for rid, tokens in sorted(results.items()):
    print(rid, "->", model.processor.tokenizer.decode(tokens, skip_special=True))
