"""On-chip equality drive for the paged AF1/AF2 engine (VERDICT r2 Next #5 done
criterion): paged xattn engine == single-request flamingo.generate on the real
chip, incl. a prefix-cache hit and the chunked-prefill path."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig, Qwen2Config
from audio_flamingo_tpu.models import flamingo
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime.flamingo_engine import FlamingoRequest
from audio_flamingo_tpu.runtime.paged_flamingo_engine import PagedFlamingoEngine

EOS = 95
CFG = AF2Config(
    clap=ClapAudioConfig(),
    lm=Qwen2Config(vocab_size=96, hidden_size=64, intermediate_size=128, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
    num_audio_transform_layers=2, audio_embed_dim=16)
params = flamingo.init(jax.random.PRNGKey(0), CFG)
params["xattn"]["alpha_xattn"] = jnp.ones_like(params["xattn"]["alpha_xattn"])
params["xattn"]["alpha_dense"] = jnp.ones_like(params["xattn"]["alpha_dense"])
rng = np.random.default_rng(0)
wins = rng.normal(size=(1, 1, 4, 16)).astype(np.float32)
prefix = rng.integers(0, 90, size=(1, 128)).astype(np.int32)
tail = rng.integers(0, 90, size=(1, 18)).astype(np.int32)
ids = np.concatenate([prefix, tail], axis=1)

eng = PagedFlamingoEngine(params=params, cfg=CFG, num_rows=2, num_blocks=48,
                          block_size=16, max_blocks_per_seq=16, chunk=4,
                          eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                          compute_dtype=jnp.float32, prefix_cache=True,
                          prefill_chunk=64, n_media=1, windows_per_media=4)
eng.submit(FlamingoRequest(request_id="a", ids=ids, max_new_tokens=8, window_embeds=wins))
res1 = eng.run_until_done()
ids2 = np.concatenate([prefix, rng.integers(0, 90, size=(1, 24)).astype(np.int32)], axis=1)
eng.submit(FlamingoRequest(request_id="b", ids=ids2, max_new_tokens=8, window_embeds=wins))
res2 = eng.run_until_done()
assert eng.store.hits > 0, "expected a prefix hit on chip"
tokens, lengths = flamingo.generate(params, CFG, jnp.asarray(ids2), jnp.asarray(wins),
                                    max_new_tokens=8, eos_token_id=EOS,
                                    sampling=SamplingParams(greedy=True),
                                    rng=jax.random.PRNGKey(0), capacity=256,
                                    compute_dtype=jnp.float32)
ref = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]]
got = res2["b"]
n = min(len(ref), len(got))
print("engine:", got, "ref:", ref, flush=True)
assert got[:n] == ref[:n], (got, ref)
print("XATTN_PAGED_ONCHIP_OK", flush=True)
