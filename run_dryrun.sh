#!/bin/bash
# Validate the multi-chip path locally on an N-device virtual CPU mesh
# (mirrors the driver's dryrun harness).
N=${1:-8}
env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE -u PYTHONPATH \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=$N" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip($N)"
