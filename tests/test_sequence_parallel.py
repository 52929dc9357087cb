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
