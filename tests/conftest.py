"""Test env: force CPU with 8 fake devices so mesh/pjit/shard_map tests run anywhere.

Standard JAX trick (SURVEY.md §4.3). Note: this machine's axon sitecustomize calls
axon.register() at interpreter start, which programmatically sets jax_platforms="axon,cpu"
— overriding the JAX_PLATFORMS env var. jax.config.update after import wins, so we force
the platform through jax.config, not the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
