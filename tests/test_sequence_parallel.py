"""Sequence-parallel tests on the 8-fake-device mesh: ulysses/ring == full attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_flamingo_tpu.ops.attention import causal_mask, gqa_attention
from audio_flamingo_tpu.parallel.sequence import ring_attention, ulysses_attention

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:4]).reshape(1, 1, 4)
    return Mesh(devs, ("data", "fsdp", "model"))


def _qkv(b=2, t=64, h=8, hkv=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_full(mesh, causal):
    q, k, v = _qkv()
    mask = causal_mask(64, 64) if causal else None
    ref = gqa_attention(q, k, v, mask=mask)
    spec = NamedSharding(mesh, P(None, "model"))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = ulysses_attention(qs, ks, vs, mesh, axis="model", causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(mesh, causal):
    q, k, v = _qkv(seed=1)
    mask = causal_mask(64, 64) if causal else None
    ref = gqa_attention(q, k, v, mask=mask)
    spec = NamedSharding(mesh, P(None, "model"))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = ring_attention(qs, ks, vs, mesh, axis="model", causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ring_grad_flows(mesh):
    """SP is for training: gradients must flow through ppermute/while correctly."""
    q, k, v = _qkv(t=32, seed=2)
    spec = NamedSharding(mesh, P(None, "model"))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh, axis="model", causal=True) ** 2).sum()

    def loss_full(q, k, v):
        return (gqa_attention(q, k, v, mask=causal_mask(32, 32)) ** 2).sum()

    g_ring = jax.grad(loss_ring)(qs, ks, vs)
    g_full = jax.grad(loss_full)(q, k, v)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full), atol=2e-4, rtol=1e-4)


def test_qwen2_forward_sp_matches_dense(mesh):
    """Sequence-parallel LM forward (ring attention) == dense forward, fwd and bwd."""
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=4, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (2, 32)))
    pos = jnp.broadcast_to(jnp.arange(32)[None], (2, 32))
    x = qwen2.embed(params, ids)
    ref, _ = qwen2.forward(params, cfg, x, pos)

    spec = NamedSharding(mesh, P(None, "model"))
    xs = jax.device_put(x, spec)
    out = qwen2.forward_sp(params, cfg, xs, pos, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    # gradient equality through the ring
    def loss_sp(p):
        return (qwen2.forward_sp(p, cfg, xs, pos, mesh) ** 2).sum()

    def loss_dense(p):
        return (qwen2.forward(p, cfg, x, pos)[0] ** 2).sum()

    g_sp = jax.grad(loss_sp)(params)
    g_d = jax.grad(loss_dense)(params)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3)


def test_qwen2_forward_sp_ulysses_matches_dense(mesh):
    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.models import qwen2

    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=4, tie_word_embeddings=True)
    params = qwen2.init(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 32)))
    pos = jnp.broadcast_to(jnp.arange(32)[None], (2, 32))
    x = qwen2.embed(params, ids)
    ref, _ = qwen2.forward(params, cfg, x, pos)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    out = qwen2.forward_sp(params, cfg, xs, pos, mesh, attn_impl="ulysses")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
