"""Mesh/sharding tests on the 8-fake-CPU-device mesh (conftest sets XLA_FLAGS).

Core invariant: sharded execution == single-device execution (SURVEY.md §4.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.parallel import MeshPlan, make_mesh, param_specs, shard_params

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    cfg = AF3Config.tiny()
    params = af3.init(jax.random.PRNGKey(0), cfg)
    ntok = af3.tokens_per_window(cfg)
    rng = np.random.default_rng(0)
    ids = np.concatenate([
        np.full((8, ntok), cfg.audio_token_id),
        rng.integers(0, cfg.lm.vocab_size, size=(8, 8)),
    ], axis=1).astype(np.int32)
    mels = rng.normal(size=(8, 1, 3000, cfg.encoder.num_mel_bins)).astype(np.float32)
    return cfg, params, ids, mels


def test_specs_cover_all_params(setup):
    cfg, params, *_ = setup
    specs = param_specs(params)
    assert jax.tree.structure(specs, is_leaf=lambda x: isinstance(x, P)) == \
        jax.tree.structure(params)
    # TP rule sanity: qkv shard heads dim, o shards input dim
    lm = specs["lm"]["layers"]
    assert lm["q"]["w"] == P(None, "fsdp", "model")
    assert lm["o"]["w"] == P(None, "model", "fsdp")
    assert lm["mlp"]["down"] == P(None, "model", "fsdp")


@pytest.mark.parametrize("plan", [MeshPlan(1, 2, 4), MeshPlan(2, 2, 2),
                                  pytest.param(MeshPlan(1, 8, 1),
                                               marks=pytest.mark.full)])
def test_sharded_forward_matches_single_device(setup, plan):
    cfg, params, ids, mels = setup
    ref = np.asarray(af3.logits(params, cfg, jnp.asarray(ids), jnp.asarray(mels)))

    mesh = make_mesh(plan, devices=jax.devices()[: plan.num_devices])
    sharded, _ = shard_params(params, mesh)
    b_ids = jax.device_put(ids, NamedSharding(mesh, P(("data", "fsdp"))))
    b_mels = jax.device_put(mels, NamedSharding(mesh, P(("data", "fsdp"))))
    out = np.asarray(af3.logits(sharded, cfg, b_ids, b_mels))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.full
def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 3 and bool(jnp.isfinite(out).all())


def test_clap_tower_window_parallel():
    """HTSAT encode with the window axis sharded across the mesh == unsharded."""
    from audio_flamingo_tpu.config import ClapAudioConfig
    from audio_flamingo_tpu.models import clap as clap_mod
    from audio_flamingo_tpu.models.clap import ClapAudioTower

    cfg = ClapAudioConfig(num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=4,
                          patch_embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                          window_size=4, projection_dim=32, enable_fusion=False)
    tower = ClapAudioTower(cfg)
    params = clap_mod.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.normal(size=(8, 1, 200, 16)), jnp.float32)  # 8 windows
    ref = np.asarray(tower.encode(params, mels, None)["embeds"])

    mesh = make_mesh(MeshPlan(1, 8, 1), devices=jax.devices()[:8])
    sharded = jax.device_put(mels, NamedSharding(mesh, P(("data", "fsdp", "model"))))
    out = np.asarray(tower.encode(params, sharded, None)["embeds"])
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
