"""Test configuration.

Two jobs, both of which must happen before jax is used:

1. Force the CPU backend with 8 virtual devices so multi-chip sharding paths
   (mesh/pjit/shard_map) are exercised without TPU hardware (SURVEY.md §4).
2. Neutralize the tunneled-TPU site hook: this image injects an
   ``.axon_site`` sitecustomize that routes *all* jax compilation through a
   loopback relay to the remote TPU terminal, which makes CPU test runs
   ~20-30x slower (observed 135s -> 8s for tests/test_windows.py). Since the
   hook installs at interpreter startup — before conftest — the only reliable
   fix is to re-exec the test process once with a sanitized environment.

Set ``RODC_TEST_ON_TPU=1`` to skip both and run the suite on real hardware.
"""

import os

if os.environ.get("RODC_TEST_ON_TPU") != "1":
    # XLA_FLAGS is read when the CPU backend initializes (lazily, after this
    # file), so setting it here is still in time.
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    # The site hook may have imported jax already (pinning jax_platforms to
    # the tunneled backend from the env var at import time), in which case the
    # os.environ write above is too late — update the live config instead.
    import sys

    if "jax" in sys.modules:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():  # drop any pinned backend set
            from jax.extend.backend import clear_backends

            clear_backends()

import tempfile  # noqa: E402

os.environ.setdefault("RODC_HOME", os.path.join(tempfile.gettempdir(), "rodc_test_home"))

# Isolate the persistent XLA compilation cache: apps call jit_cache.enable()
# (apps/base.py), and without this the suite reads/writes the SAME on-disk
# cache as the TPU bench/profiling tools. A tool run killed mid-write leaves a
# truncated entry whose native deserialization can segfault a later test-run
# compile of the same key — observed as a hard SIGSEGV inside
# jax compilation_cache.get_executable_and_time. A per-run temp dir makes the
# suite hermetic; RODC_JIT_CACHE remains overridable for cache-reuse runs.
if "RODC_JIT_CACHE" not in os.environ:
    os.environ["RODC_JIT_CACHE"] = tempfile.mkdtemp(prefix="rodc_test_jit_cache_")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_PRISTINE_SNAPSHOT = None


_MAPS_CLEAR_THRESHOLD = 8000


def _n_memory_maps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no map-count limit to manage
        return 0


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_memory_maps():
    """Drop compiled-executable caches when the process's mmap count grows.

    Each compiled cascade program holds thousands of anonymous mmaps (JIT
    code + constants); across the full suite the process crosses the kernel's
    vm.max_map_count (65530 default), at which point LLVM's JIT memory
    manager segfaults mid-compile — observed as a hard SIGSEGV around test
    ~300 (tests/test_windows_sched.py) in three consecutive full-suite runs,
    with /proc/<pid>/maps at ~47k after only a third of the suite
    (test_cascade.py +14105, test_compaction.py +19194). Executables are
    only reachable through jax's jit caches, so clearing them bounds the map
    count (measured: 1419 final when clearing every module). Clearing is
    conditional on an 8k threshold to keep cross-module cache hits: the
    largest single-module growth observed is ~19k, so the peak stays under
    ~27k — far from the kernel limit.
    """
    yield
    if _n_memory_maps() < _MAPS_CLEAR_THRESHOLD:
        return
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


@pytest.fixture(autouse=True)
def _reset_config():
    """Isolate config mutations between tests.

    Restores the pristine session-start snapshot (not a per-test one): higher
    -scoped fixtures execute *before* this autouse fixture, so a per-test
    snapshot would capture — and then preserve — their mutations.
    """
    global _PRISTINE_SNAPSHOT
    from rapidobjectdetectionusingcascadedcnns_tpu import config as cf

    if _PRISTINE_SNAPSHOT is None:
        _PRISTINE_SNAPSHOT = cf.snapshot()
    yield
    cf.restore(_PRISTINE_SNAPSHOT)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
