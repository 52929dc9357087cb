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
# XLA:CPU collectives have a HARD 40 s rendezvous termination timeout (the process
# aborts with SIGABRT, rendezvous.cc). On few-core hosts (this round's machine has
# nproc=1) the 8 fake device threads timeslice one core and a participant can
# legitimately arrive minutes late. Raise the timeouts; correctness tests don't care
# about collective latency.
if "collective_call_terminate_timeout" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
        " --xla_cpu_collective_timeout_seconds=3000"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
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
_want = 2 << 30
if _soft != resource.RLIM_INFINITY and _soft < _want:
    _cap = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_cap, _hard))
    # argv[0] is .../bin/pytest (direct) or .../pytest/__main__.py (python -m)
    if os.environ.get("_AF_STACK_REEXEC") != "1" and "pytest" in sys.argv[0]:
        os.environ["_AF_STACK_REEXEC"] = "1"
        # pytest's global capture has already pointed fds 1/2 at its (deleted)
        # tempfiles by the time conftests import — suspend it so the re-exec'd
        # process inherits the REAL stdout/stderr
        try:
            import gc

            from _pytest.capture import CaptureManager

            for _obj in gc.get_objects():
                if isinstance(_obj, CaptureManager):
                    _obj.suspend_global_capture(in_=True)
                    break
        except Exception:
            pass
        os.execv(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA:CPU intermittently segfaults inside LLVM on
# the suite's heaviest programs after ~100 in-process compiles (native fault, not
# reproducible in isolation). Caching compiled executables on disk makes repeat
# runs skip those compiles entirely — the first (populating) run carries the
# residual risk, every later run is fast and stable.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without these flags: cache is an optimization only
    pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: slowest e2e tests — skipped by default so the default gate "
        "stays fast; run the tier with `-m full` (zero coverage loss: "
        "everything else still runs by default)")


def pytest_collection_modifyitems(config, items):
    """Default run skips @pytest.mark.full (VERDICT r4 #8: keep `pytest -q`
    under the half-hour line); any explicit -m expression takes over."""
    if config.getoption("-m"):
        return
    skip_full = pytest.mark.skip(reason="full tier: run with -m full")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip_full)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The segfault above correlates with CUMULATIVE in-process compile state (the
    same tests always pass in isolation; full-suite runs crash ~60% in regardless
    of which heavy file lands there). Dropping the executable caches between test
    modules keeps the process near isolation conditions; the persistent cache
    makes the re-compiles cheap AOT loads."""
    yield
    jax.clear_caches()
