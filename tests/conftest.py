"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests exercise TPU-shaped code paths (sharding included) without TPU
hardware; the driver separately compile-checks the real multi-chip path via
__graft_entry__.dryrun_multichip.
"""
import os

# Force the virtual CPU mesh even when the environment pre-selects a TPU
# platform (the axon sitecustomize registers a tunneled TPU backend driven by
# PALLAS_AXON_POOL_IPS; tests must not depend on it).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# XLA_FLAGS set after interpreter start is unreliable here (the axon
# sitecustomize pre-imports jax); the config route works pre-backend-init.
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute interpret-mode kernel-equivalence tests; "
        "excluded from the default fast tier (run_tests.sh --all)")
    config.addinivalue_line(
        "markers",
        "nocache: disable the JAX persistent compilation cache for this "
        "test. The cache WRITE (compilation_cache.put_executable_and_time, "
        "zstandard serialization) segfaults natively on the huge merged-warp "
        "executables on this host; the same compiles pass with the cache "
        "off (round-4 verdict root cause).")


@pytest.fixture(autouse=True)
def _nocache_compilation(request):
    """For tests marked `nocache`, turn the persistent compilation cache off
    around the test body and restore it afterwards.

    A bare config update is NOT enough: jax latches the cache decision
    (`_cache_checked`/`_cache_used` in jax._src.compilation_cache) at the
    first compile of the process, so the dir must be cleared AND the cache
    singleton reset — verified to stop writes on this jax (the round-4
    cold-suite run segfaulted in the cache writer under a config-only
    fixture)."""
    if request.node.get_closest_marker("nocache") is None:
        yield
        return
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_compilation_cache_dir
    _cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        _cc.reset_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
