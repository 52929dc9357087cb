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

# XLA:CPU's LLVM passes recurse deeply on the suite's largest programs (speculative
# while_loop stacks, 32-layer SP train steps) and compile INLINE on the calling
# thread; at the default 8 MB stack the suite intermittently segfaults inside
# native compilation (observed at different tests across runs). Raising RLIMIT_STACK
# in-process is NOT reliable for the main thread — the kernel sizes the stack growth
# gap (and mmap_base) from the limit at execve time, so an mmap can already sit where
# the stack would grow. Re-exec pytest once with the raised limit so the reservation
# is made at exec.
import resource  # noqa: E402
import sys  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    _cap = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_cap, _hard))
    if (os.environ.get("_AF_STACK_REEXEC") != "1"
            and "pytest" in os.path.basename(sys.argv[0])):
        os.environ["_AF_STACK_REEXEC"] = "1"
        os.execv(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
