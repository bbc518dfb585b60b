#!/bin/sh
# Test runner: forces the virtual 8-device CPU mesh. XLA parses XLA_FLAGS when
# the (axon) sitecustomize pre-imports jax at interpreter start, so these MUST
# be process-start environment variables — conftest.py alone cannot set them
# on hosts with that sitecustomize. The multi-device mesh test skips without
# them; everything else is env-agnostic.
exec env \
    JAX_PLATFORMS=cpu \
    PALLAS_AXON_POOL_IPS= \
    XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
    JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}" \
    python -m pytest tests/ "$@"
