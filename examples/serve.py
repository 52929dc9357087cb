"""Example: production-style serving with the paged continuous-batching engine.

Showcases the full serving feature set on a tiny random model (swap in
api.load(...) for real weights):
- paged KV pool with automatic PREFIX CACHING (the shared system prompt is
  computed once and shared read-only across requests),
- chunked prefill (long prompts never stall the decode loop for more than one
  chunk), preempt-and-resume under pool pressure,
- per-request sampling (greedy and sampled requests share one compiled program),
- per-request token STREAMING callbacks.

python examples/serve.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import


import jax.numpy as jnp

from audio_flamingo_tpu.api import AudioFlamingo
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.engine import Request
from audio_flamingo_tpu.runtime.paged_engine import PagedEngine

model = AudioFlamingo.from_random(compute_dtype=jnp.float32)
engine = PagedEngine(
    params=model.params, cfg=model.cfg,
    # block_size should be <= the shared-prefix length or nothing can be shared
    # (only FULL blocks are prefix-cache candidates); 64 suits chat prompts
    num_rows=4, num_blocks=128, block_size=64, max_blocks_per_seq=32, chunk=16,
    eos_token_id=model.eos_token_id, sampling=SamplingParams(greedy=True),
    compute_dtype=jnp.float32,
    prefix_cache=True,        # share the recurring system/audio prefix
    prefill_chunk=512,        # Sarathi-style stall control for long prompts
)

SYSTEM = "You are a helpful audio assistant. Answer concisely."
for i in range(8):
    batch = model.processor(messages=[
        {"role": "system", "content": SYSTEM},
        {"role": "user", "content": f"request {i}?"},
    ])
    sampling = None if i % 2 == 0 else SamplingParams(greedy=False, temperature=0.7,
                                                      top_p=0.9)
    engine.submit(Request(
        request_id=f"req-{i}", ids=batch["ids"], max_new_tokens=32,
        sampling=sampling,
        on_tokens=lambda toks, i=i: print(f"  [req-{i}] +{len(toks)} tokens",
                                          flush=True),
    ))

results = engine.run_until_done()
for rid, tokens in sorted(results.items()):
    print(rid, "->", model.processor.tokenizer.decode(tokens, skip_special=True))
if engine.store is not None:
    print(f"prefix cache: {engine.store.hits} page hits, "
          f"{engine.store.misses} misses; preemptions: {engine.preemptions}")

# ------------------------------------------------------------------ speculative
# Attach a small draft LM (api.load_draft for real checkpoints) and the paged
# engine runs draft/verify speculation — greedy engines use the exact-argmax
# rule, sampled engines the Leviathan rule; both emit exactly what the target
# alone would (docs/SERVING.md "Speculative decoding on the paged pool").
from audio_flamingo_tpu.config import Qwen2Config
from audio_flamingo_tpu.models import qwen2 as qwen2_model

import jax

draft_cfg = Qwen2Config(vocab_size=model.cfg.lm.vocab_size, hidden_size=32,
                        intermediate_size=64, num_layers=1, num_heads=4,
                        num_kv_heads=2, tie_word_embeddings=True)
draft_params = qwen2_model.init(jax.random.PRNGKey(7), draft_cfg)
spec_engine = PagedEngine(
    params=model.params, cfg=model.cfg, num_rows=4, num_blocks=128,
    block_size=64, max_blocks_per_seq=32, chunk=16,
    eos_token_id=model.eos_token_id, sampling=SamplingParams(greedy=True),
    compute_dtype=jnp.float32, preempt=False,
    draft_params=draft_params, draft_cfg=draft_cfg, spec_k=4, spec_rounds=4)
for i in range(4):
    batch = model.processor(messages=[{"role": "user", "content": f"spec {i}?"}])
    spec_engine.submit(Request(request_id=f"spec-{i}", ids=batch["ids"],
                               max_new_tokens=24))
spec_results = spec_engine.run_until_done()
print(f"speculative engine served {len(spec_results)} requests "
      f"(greedy rule; output == target-only greedy)")
