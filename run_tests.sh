#!/bin/sh
# Test runner: forces the virtual 8-device CPU mesh. XLA parses XLA_FLAGS when
# the (axon) sitecustomize pre-imports jax at interpreter start, so these MUST
# be process-start environment variables — conftest.py alone cannot set them
# on hosts with that sitecustomize. The multi-device mesh test skips without
# them; everything else is env-agnostic.
#
# Tiers:
#   default : fast tier (skips tests marked `slow`), one pytest process.
#   --all   : full suite, ONE PYTEST PROCESS PER MODULE. The large Pallas-
#             interpret merged-kernel programs destabilize native XLA:CPU
#             state cumulatively: three cold full-suite runs crashed natively
#             at the same test (in the cache serializer, the cache
#             deserializer, and the compiler itself respectively) while that
#             test passes in isolation — process isolation per module bounds
#             the native state and makes a crash attributable.
# Tests marked `nocache` additionally disable the JAX persistent compilation
# cache around their body (conftest fixture): cache serialize AND deserialize
# of that executable class crash natively on this host.
run_env() {
    env \
        JAX_PLATFORMS=cpu \
        PALLAS_AXON_POOL_IPS= \
        XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
        JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}" \
        "$@"
}

# Modules whose tests each compile a full merged-warp solve: the XLA:CPU
# compiler crashes natively after SEVERAL such compiles in one process
# (reproduced at different tests with the persistent cache off), so these
# run ONE PYTEST PROCESS PER TEST.
HEAVY="tests/test_fused_warp.py tests/test_mesh.py tests/test_variational_modes.py"

is_heavy() {
    for h in $HEAVY; do [ "$h" = "$1" ] && return 0; done
    return 1
}

if [ "$1" = "--all" ]; then
    shift
    case "$1" in
        tests/*)
            # explicit target(s): single process, no slow filter
            exec env \
                JAX_PLATFORMS=cpu \
                PALLAS_AXON_POOL_IPS= \
                XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
                JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}" \
                python -m pytest "$@"
            ;;
    esac
    fail=0
    for f in tests/test_*.py; do
        echo "==== $f ===="
        if is_heavy "$f"; then
            for t in $(run_env python -m pytest "$f" --collect-only -q \
                       2>/dev/null | grep '::' | cut -d' ' -f1); do
                echo "---- $t ----"
                run_env python -m pytest "$t" "$@" || fail=1
            done
        else
            run_env python -m pytest "$f" "$@" || fail=1
        fi
    done
    echo "==== overall: $( [ $fail -eq 0 ] && echo GREEN || echo FAILURES ) ===="
    exit $fail
fi
exec env \
    JAX_PLATFORMS=cpu \
    PALLAS_AXON_POOL_IPS= \
    XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
    JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}" \
    python -m pytest tests/ -m "not slow" "$@"
