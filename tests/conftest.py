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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_PRISTINE_SNAPSHOT = None


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
