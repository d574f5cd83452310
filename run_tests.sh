#!/bin/bash
# CPU-only test runner: drop the axon TPU hook (sitecustomize claims the
# single tunneled chip at interpreter start, serializing every python
# process) and force an 8-device virtual CPU mesh.
env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE -u PYTHONPATH \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tests \
    python -m pytest "${@:-tests/}" -q
