"""Hardware validation: run kernel/numerics spot checks on the attached TPU chip.

Usage: python scripts/hw_check.py   (runs each check in-process, prints PASS/FAIL lines)
CI-on-CPU covers interpret mode; this script is the on-silicon gate (run once per round).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

FAILED = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        FAILED.append(name)
        print(f"FAIL {name}: {e}", flush=True)


def flash_vs_xla():
    from audio_flamingo_tpu.ops.attention import causal_mask, gqa_attention
    from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 1500, 20, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 1500, 4, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 1500, 4, 64)), jnp.bfloat16)
    ref = gqa_attention(q, k, v, mask=causal_mask(1500, 1500))
    out = flash_attention(q, k, v, causal=True)
    d = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    assert d < 0.05, d


def flash_backward_vs_xla():
    from audio_flamingo_tpu.ops.pallas.flash_attention import (_reference_attention,
                                                               flash_attention)

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, 1024, 8, 128), jnp.float32) * 0.3
    k = jax.random.normal(ks[1], (1, 1024, 2, 128), jnp.float32) * 0.3
    v = jax.random.normal(ks[2], (1, 1024, 2, 128), jnp.float32) * 0.3

    def lf(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def lr(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, True, None, 0) ** 2)

    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(q, k, v)
    # pin the XLA reference to HIGHEST: its default f32 matmuls demote to bf16 passes
    # on TPU (~1e-2 error) and would dominate the comparison
    with jax.default_matmul_precision("highest"):
        gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gf, gr):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 5e-4, rel


def pallas_mel_vs_xla():
    from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
    from audio_flamingo_tpu.config import MelConfig

    fe_p = WhisperMelFrontend(MelConfig(num_mel_bins=128), use_pallas=True)
    fe_x = WhisperMelFrontend(MelConfig(num_mel_bins=128), use_pallas=False)
    wav = jnp.asarray((np.random.default_rng(0).normal(size=(2, 480_000)) * 0.1)
                      .astype(np.float32))
    d = float(jnp.abs(fe_p._window_mels(wav) - fe_x._window_mels(wav)).max())
    assert d < 1e-4, d


def quant_matmul_kernel():
    from audio_flamingo_tpu.ops.quant import q_matmul, quantize_linear

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 1024)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(1024, 1024)) * 0.1, jnp.float32)
    q = quantize_linear(w)
    ref = np.asarray(q_matmul(x, q, use_pallas=False).astype(jnp.float32))
    out = np.asarray(q_matmul(x, q, use_pallas=True).astype(jnp.float32))
    d = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert d < 0.02, d


def paged_attention_kernel():
    """Compiled-mode check of the paged decode kernel at 7B-like dims (nkv=4, g=7,
    hd=128, 128-token pages), mixed row lengths incl. empty and partial pages."""
    from audio_flamingo_tpu.ops.pallas.paged_attention import (
        merge_current_token, paged_attention, paged_attention_reference)

    rng = np.random.default_rng(5)
    L, num_blocks, block = 2, 64, 128
    nkv, g, hd = 4, 7, 128
    B, max_pages = 4, 16
    k_pool = jnp.asarray(rng.normal(size=(L, num_blocks, block, nkv, hd)), jnp.bfloat16)
    v_pool = jnp.asarray(rng.normal(size=(L, num_blocks, block, nkv, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, nkv, g, hd)), jnp.bfloat16)
    lengths = jnp.asarray([0, 130, 1000, 2048], jnp.int32)
    tables = np.full((B, max_pages), -1, np.int32)
    ids = rng.permutation(np.arange(1, num_blocks))
    ptr = 0
    for b in range(B):
        n = int(np.ceil(int(lengths[b]) / block))
        tables[b, :n] = ids[ptr: ptr + n]
        ptr += n
    tables = jnp.asarray(tables)
    k_cur = jnp.asarray(rng.normal(size=(B, nkv, hd)), jnp.bfloat16)
    v_cur = jnp.asarray(rng.normal(size=(B, nkv, hd)), jnp.bfloat16)

    o, m, l = paged_attention(q, k_pool, v_pool, tables, lengths, jnp.asarray(0))
    got = np.asarray(merge_current_token(q, k_cur, v_cur, o, m, l))
    with jax.default_matmul_precision("highest"):
        o_r, m_r, l_r = paged_attention_reference(q, k_pool, v_pool, tables, lengths,
                                                  jnp.asarray(0))
        want = np.asarray(merge_current_token(q, k_cur, v_cur, o_r, m_r, l_r))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.02, rel
    assert np.isfinite(got).all()


def tiny_e2e_generate():
    from audio_flamingo_tpu.api import AudioFlamingo

    model = AudioFlamingo.from_random(compute_dtype=jnp.bfloat16)
    wav = (0.2 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    a = model.generate(sound=wav, prompt="tone?", max_new_tokens=6, seed=1)
    b = model.generate(sound=wav, prompt="tone?", max_new_tokens=6, seed=1)
    assert a == b  # greedy determinism on hardware


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    check("flash_attention_1500_bf16", flash_vs_xla)
    check("flash_fused_backward", flash_backward_vs_xla)
    check("pallas_fused_mel", pallas_mel_vs_xla)
    check("w8a16_quant_matmul", quant_matmul_kernel)
    check("paged_attention_kernel", paged_attention_kernel)
    check("tiny_e2e_generate", tiny_e2e_generate)
    sys.exit(1 if FAILED else 0)
