#!/bin/sh
# Test runner: forces the virtual 8-device CPU mesh. XLA parses XLA_FLAGS when
# the (axon) sitecustomize pre-imports jax at interpreter start, so these MUST
# be process-start environment variables — conftest.py alone cannot set them
# on hosts with that sitecustomize. The multi-device mesh test skips without
# them; everything else is env-agnostic.
#
# Tiers: default = fast tier (skips tests marked `slow`); `--all` runs the
# full suite including the multi-minute interpret-mode kernel-equivalence
# tests. Tests marked `nocache` disable the JAX persistent compilation cache
# around their body (conftest fixture) — the cache writer segfaults natively
# on the huge merged-warp executables on this host (round-4 verdict root
# cause), so those compiles must never hit the persistent cache.
if [ "$1" = "--all" ]; then
    shift
    set -- "$@"
else
    set -- -m "not slow" "$@"
fi
exec env \
    JAX_PLATFORMS=cpu \
    PALLAS_AXON_POOL_IPS= \
    XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
    JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}" \
    python -m pytest tests/ "$@"
