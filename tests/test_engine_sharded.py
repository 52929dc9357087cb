"""Distributed serving: the continuous-batching engines run with TENSOR-PARALLEL
sharded params on a device mesh, token-exact vs the unsharded engine — XLA SPMD
propagates the Megatron-style param shardings (parallel/sharding.py) through the
jitted prefill/decode-chunk programs, so serving scales over ICI with no engine
code changes (SURVEY.md §2.9 TP row: 'needed for fast decode on v5e-8')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config, Qwen2Config, WhisperEncoderConfig
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.parallel import MeshPlan, make_mesh, shard_params
from audio_flamingo_tpu.runtime.engine import BatchEngine, Request

jax.config.update("jax_default_matmul_precision", "highest")

EOS = 127
CFG = AF3Config(
    encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=32, num_layers=1, num_heads=4,
                                 ffn_dim=64, max_source_positions=12),
    lm=Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    audio_token_id=120,
)


@pytest.fixture(scope="module")
def params():
    return af3.init(jax.random.PRNGKey(0), CFG)


def _run(params, prompts, mels=None):
    eng = BatchEngine(params=params, cfg=CFG, num_slots=2, capacity=256, chunk=4,
                      eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                      compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=f"r{i}", ids=p.copy(),
                           mels=None if mels is None else mels[i],
                           max_new_tokens=8))
    return eng.run_until_done()


@pytest.mark.parametrize("plan", [MeshPlan(data=1, fsdp=1, model=8),
                                  MeshPlan(data=1, fsdp=2, model=4)])
def test_slot_engine_tp_sharded_matches_dense(params, plan):
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 120, (1, 6 + i)).astype(np.int32) for i in range(3)]
    dense = _run(params, prompts)
    sharded, _ = shard_params(params, make_mesh(plan))
    tp = _run(sharded, prompts)
    assert tp == dense


def test_slot_engine_tp_sharded_audio(params):
    """Audio requests: the encoder + adaptor + scatter prefill also runs sharded."""
    rng = np.random.default_rng(4)
    ntok = CFG.encoder.max_source_positions // CFG.encoder.pool_stride
    frames = 2 * CFG.encoder.max_source_positions
    ids = np.concatenate([np.full((1, ntok), CFG.audio_token_id),
                          rng.integers(0, 120, (1, 6))], axis=1).astype(np.int32)
    mels = [rng.normal(size=(1, 1, frames, 16)).astype(np.float32)]
    dense = _run(params, [ids], mels)
    sharded, _ = shard_params(params, make_mesh(MeshPlan(data=1, fsdp=1, model=8)))
    tp = _run(sharded, [ids], mels)
    assert tp == dense


def test_slot_engine_spec_tp_sharded_matches_dense(params):
    """Speculative decoding under TENSOR-PARALLEL sharded target+draft params ==
    the dense speculative engine, token-exactly — XLA SPMD propagates the param
    shardings through decode_spec_chunk's draft/verify/rollback program too."""
    from audio_flamingo_tpu.models import qwen2

    draft_cfg = Qwen2Config(vocab_size=128, hidden_size=32, intermediate_size=64,
                            num_layers=1, num_heads=4, num_kv_heads=2,
                            tie_word_embeddings=True)
    draft = qwen2.init(jax.random.PRNGKey(7), draft_cfg)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 120, (1, 5 + i)).astype(np.int32) for i in range(3)]

    def run(p, d):
        eng = BatchEngine(params=p, cfg=CFG, num_slots=2, capacity=256,
                          eos_token_id=EOS, sampling=SamplingParams(greedy=True),
                          compute_dtype=jnp.float32, draft_params=d,
                          draft_cfg=draft_cfg, spec_k=3, spec_rounds=2)
        for i, pr in enumerate(prompts):
            eng.submit(Request(request_id=f"r{i}", ids=pr.copy(),
                               max_new_tokens=8))
        return eng.run_until_done()

    dense = run(params, draft)
    mesh = make_mesh(MeshPlan(data=1, fsdp=2, model=4))
    sharded, _ = shard_params(params, mesh)
    draft_sharded, _ = shard_params(draft, mesh)
    assert run(sharded, draft_sharded) == dense
