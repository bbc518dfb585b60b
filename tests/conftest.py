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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
