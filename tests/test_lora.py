"""LoRA / QLoRA adapters (ops/lora.py): identity at init, adapter-only
training through the standard train step (base bit-frozen), merge == runtime
adapter forward, and the QLoRA (int8 base) path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3, qwen2
from audio_flamingo_tpu.ops.lora import add_lora, lora_mask, merge_lora
from audio_flamingo_tpu.runtime.processor import AF3Processor, AUDIO_TOKEN
from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer, train_bpe
from audio_flamingo_tpu.train.data import BatchBuilder, MixtureSampler, Source, batches
from audio_flamingo_tpu.train.stages import AF3_STAGES
from audio_flamingo_tpu.train.train_step import (init_state,
                                                 make_jit_train_step,
                                                 make_optimizer, TrainState)

jax.config.update("jax_default_matmul_precision", "highest")

CFG = AF3Config.tiny()


@pytest.fixture(scope="module")
def lm_params():
    return qwen2.init(jax.random.PRNGKey(0), CFG.lm)


def test_lora_identity_at_init(lm_params):
    """Zero-init lora_b makes the adapted tree compute EXACTLY the base fn."""
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.lm.vocab_size,
                                                        (2, 7)), jnp.int32)
    base = qwen2.logits_from_ids(lm_params, CFG.lm, ids)
    adapted = add_lora(jax.random.PRNGKey(1), lm_params, rank=4)
    got = qwen2.logits_from_ids(adapted, CFG.lm, ids)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_lora_mask_marks_only_adapters(lm_params):
    adapted = add_lora(jax.random.PRNGKey(1), lm_params, rank=4)
    mask = lora_mask(adapted)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = [p for p, v in flat if v]
    off = [p for p, v in flat if not v]
    assert on and off
    assert all(p[-1].key in ("lora_a", "lora_b") for p in on)


@pytest.fixture(scope="module")
def train_setup():
    vocab, merges = train_bpe(["a dog barks", "music plays"], 380)
    tok = BBPETokenizer(vocab, merges)
    cfg = dataclasses.replace(
        CFG, lm=dataclasses.replace(CFG.lm, vocab_size=512),
        audio_token_id=tok.special_tokens[AUDIO_TOKEN])
    proc = AF3Processor(tokenizer=tok, cfg=cfg)
    params = af3.init(jax.random.PRNGKey(0), cfg)

    def example(rng):
        wav = (rng.normal(size=16000) * 0.1).astype(np.float32)
        return [wav], f"What is {AUDIO_TOKEN}?", "a dog barks"

    sampler = MixtureSampler([Source("synthetic", 1.0, example)], seed=0)
    builder = BatchBuilder(processor=proc, pad_id=0)
    batch = next(batches(sampler, builder, batch_size=2))
    return cfg, params, batch


@pytest.mark.full
def test_lora_training_freezes_base_and_learns(train_setup):
    """lora_only training: loss decreases, adapter leaves move, EVERY base
    leaf (LM weights, embed, encoder, adaptor) stays bit-identical."""
    cfg, params, batch = train_setup
    adapted = add_lora(jax.random.PRNGKey(2), params, rank=4)
    adapted = jax.tree.map(jnp.copy, adapted)
    stage = AF3_STAGES["3.5_context_think"]   # LM trains, encoder frozen
    opt = make_optimizer(stage, adapted, warmup_steps=1, total_steps=30,
                         lora_only=True)
    state = TrainState(adapted, opt.init(adapted), jnp.zeros((), jnp.int32))
    step_fn = make_jit_train_step(cfg, opt, compute_dtype=jnp.float32)

    mask = lora_mask(adapted)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    losses = []
    for _ in range(8):
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    moved = 0
    for (path, b), a, is_lora in zip(
            jax.tree_util.tree_flatten_with_path(before)[0],
            jax.tree.leaves(state.params), jax.tree.leaves(mask)):
        if is_lora:
            moved += int(not np.array_equal(b, np.asarray(a)))
        else:
            np.testing.assert_array_equal(b, np.asarray(a), err_msg=str(path))
    assert moved > 0


def test_merge_lora_matches_runtime_adapters(train_setup):
    """merge_lora folds trained adapters into dense weights: the merged tree's
    logits == the adapter-carrying tree's logits."""
    cfg, params, batch = train_setup
    adapted = add_lora(jax.random.PRNGKey(3), params["lm"], rank=4)
    # push lora_b off zero deterministically so the adapters matter
    adapted = jax.tree_util.tree_map_with_path(
        lambda p, x: (x + 0.01) if (hasattr(p[-1], "key")
                                    and p[-1].key == "lora_b") else x, adapted)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 500, (2, 6)), jnp.int32)
    with_adapters = qwen2.logits_from_ids(adapted, cfg.lm, ids)
    merged = merge_lora(adapted)
    assert not any("lora" in str(p)
                   for p, _ in jax.tree_util.tree_flatten_with_path(merged)[0])
    dense = qwen2.logits_from_ids(merged, cfg.lm, ids)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(with_adapters),
                               rtol=2e-5, atol=2e-5)
    # merged tree keeps the ORIGINAL layout (plain-array mlp entries restored)
    assert not isinstance(merged["layers"]["mlp"]["gate"], dict)


def test_qlora_int8_base(lm_params):
    """QLoRA: adapters over a frozen int8 base — identity at init vs the int8
    model, and the delta flows once lora_b moves."""
    from audio_flamingo_tpu.ops.quant import quantize_lm_params

    q = quantize_lm_params(lm_params)
    adapted = add_lora(jax.random.PRNGKey(4), q, rank=4,
                       targets=("q", "k", "v", "o"))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, CFG.lm.vocab_size,
                                                        (1, 6)), jnp.int32)
    base = qwen2.logits_from_ids(q, CFG.lm, ids)
    got = qwen2.logits_from_ids(adapted, CFG.lm, ids)
    # the adapter term is exactly zero, but fusing the +0 add changes XLA's
    # reassociation of q_matmul's rescale — identity holds to 1 ulp, not bit
    np.testing.assert_allclose(np.asarray(base), np.asarray(got),
                               rtol=0, atol=1e-6)
    bumped = jax.tree_util.tree_map_with_path(
        lambda p, x: (x + 0.05) if (hasattr(p[-1], "key")
                                    and p[-1].key == "lora_b") else x, adapted)
    moved = qwen2.logits_from_ids(bumped, CFG.lm, ids)
    assert not np.array_equal(np.asarray(moved), np.asarray(base))


def test_lora_save_load_roundtrip(tmp_path, lm_params):
    """save_lora writes only adapter leaves; load_lora reinserts them into a
    fresh base tree — logits match the original adapted tree exactly."""
    from audio_flamingo_tpu.ops.lora import load_lora, save_lora

    adapted = add_lora(jax.random.PRNGKey(5), lm_params, rank=4)
    adapted = jax.tree_util.tree_map_with_path(
        lambda p, x: (x + 0.02) if (hasattr(p[-1], "key")
                                    and p[-1].key == "lora_b") else x, adapted)
    f = str(tmp_path / "adapter.safetensors")
    save_lora(f, adapted)
    import os
    assert os.path.getsize(f) < 2_000_000      # adapters only, tiny

    restored = load_lora(f, lm_params)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, CFG.lm.vocab_size, (1, 6)), jnp.int32)
    want = qwen2.logits_from_ids(adapted, CFG.lm, ids)
    got = qwen2.logits_from_ids(restored, CFG.lm, ids)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_lora_applies_on_a8_prefill_path(lm_params):
    """Adapters must flow on the w8a8 prefill fast paths too (they were
    silently dropped): with a8_prefill, bumped adapters change multi-token
    logits, and the a8 adapted output tracks the non-a8 adapted output to the
    a8 accuracy band."""
    from audio_flamingo_tpu.ops.quant import quantize_lm_params

    a8_cfg = dataclasses.replace(CFG.lm, a8_prefill=True)
    q = quantize_lm_params(lm_params)
    adapted = jax.tree_util.tree_map_with_path(
        lambda p, x: (x + 0.05) if (hasattr(p[-1], "key")
                                    and p[-1].key == "lora_b") else x,
        add_lora(jax.random.PRNGKey(6), q, rank=4))
    ids = jnp.asarray(np.random.default_rng(4).integers(
        0, CFG.lm.vocab_size, (1, 8)), jnp.int32)
    base_a8 = qwen2.logits_from_ids(q, a8_cfg, ids)
    got_a8 = qwen2.logits_from_ids(adapted, a8_cfg, ids)
    assert not np.allclose(np.asarray(base_a8), np.asarray(got_a8), atol=1e-3)
    ref = qwen2.logits_from_ids(adapted, CFG.lm, ids)       # non-a8 adapted
    # a8 dynamic activation quantization carries a small band (test_quant.py)
    diff = np.abs(np.asarray(got_a8) - np.asarray(ref)).max()
    band = np.abs(np.asarray(ref)).max() * 0.05 + 0.05
    assert diff < band, (diff, band)


def test_partition_lora_qlora_training_step(lm_params):
    """partition_lora: rebuild is lossless, and a QLoRA update step over ONLY
    the adapter leaves (int8 base passed as a non-diff argument) decreases the
    loss while the base stays bit-identical — the single-chip 7B training
    recipe (int8 base + LoRA + remat) at test scale."""
    import optax

    from audio_flamingo_tpu.ops.lora import partition_lora
    from audio_flamingo_tpu.ops.quant import quantize_lm_params

    q = quantize_lm_params(lm_params)
    adapted = add_lora(jax.random.PRNGKey(7), q, rank=4)
    lora_leaves, base_leaves, rebuild = partition_lora(adapted)
    # lossless rebuild
    again = rebuild(lora_leaves, base_leaves)
    for a, b in zip(jax.tree.leaves(adapted), jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(l.shape[-1] in (4,) or l.shape[-2] == 4 for l in lora_leaves)

    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, CFG.lm.vocab_size, (2, 12)), jnp.int32)
    opt = optax.adamw(1e-2)
    opt_state = opt.init(lora_leaves)

    @jax.jit
    def step(lora_vals, opt_state, base_vals, ids):
        def loss_fn(lv):
            params = rebuild(lv, base_vals)
            logits = qwen2.logits_from_ids(params, CFG.lm, ids)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt = ids[:, 1:]
            return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

        loss, g = jax.value_and_grad(loss_fn)(lora_vals)
        updates, opt_state = opt.update(g, opt_state, lora_vals)
        return optax.apply_updates(lora_vals, updates), opt_state, loss

    before_base = [np.asarray(b).copy() for b in base_leaves]
    losses = []
    for _ in range(6):
        lora_leaves, opt_state, loss = step(lora_leaves, opt_state,
                                            base_leaves, ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    for a, b in zip(before_base, base_leaves):
        np.testing.assert_array_equal(a, np.asarray(b))
