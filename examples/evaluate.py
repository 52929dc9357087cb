"""Example: run the eval harness over a JSONL benchmark manifest.

Manifest rows: {"audio": "path.wav", "prompt": "...", "target": "...", "task": "asr|mcq|qa|caption"}

python examples/evaluate.py manifest.jsonl [--model DIR] [--think]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root import


import argparse
import json

import jax.numpy as jnp

from audio_flamingo_tpu.api import AudioFlamingo, load
from audio_flamingo_tpu.audio.io import load_audio
from audio_flamingo_tpu.eval.harness import EvalExample, evaluate, evaluate_batched

p = argparse.ArgumentParser()
p.add_argument("manifest")
p.add_argument("--model", default=None)
p.add_argument("--think", action="store_true")
p.add_argument("--max-new-tokens", type=int, default=128)
p.add_argument("--batched", action="store_true", help="run through the batching engine")
args = p.parse_args()

model = load(args.model) if args.model else AudioFlamingo.from_random(
    compute_dtype=jnp.float32)

examples = []
with open(args.manifest) as f:
    for line in f:
        row = json.loads(line)
        wav = load_audio(row["audio"], 16_000) if row.get("audio") else None
        examples.append(EvalExample(audio=wav, prompt=row["prompt"],
                                    target=row["target"], task=row.get("task", "qa")))

if args.batched:
    result = evaluate_batched(model, examples, max_new_tokens=args.max_new_tokens,
                              think=args.think)
else:
    result = evaluate(model, examples, max_new_tokens=args.max_new_tokens,
                      think=args.think)
print(json.dumps({"scores": result.task_scores, "serving": result.serving}, indent=1))
