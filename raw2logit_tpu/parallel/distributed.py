"""Multi-host / pod-slice support.

One v5e host drives 4-8 chips over ICI; beyond that, hosts coordinate over
DCN via jax.distributed. The sweep dimension (independent pipeline/fold
runs) shards across hosts WITHOUT collectives (training/sweep.py --shard);
a single large data-parallel run uses this module: initialize the runtime,
then the global mesh spans every chip and the jitted train step's gradient
all-reduce rides ICI within hosts and DCN across.
"""

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize with env fallbacks
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID). No-op when
    single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # multi-process CPU (tests / local sim) needs an explicit
        # cross-process collectives backend
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=(num_processes if num_processes is not None
                       else int(os.environ["NUM_PROCESSES"])),
        process_id=(process_id if process_id is not None
                    else int(os.environ["PROCESS_ID"])))
    return True


def global_mesh(axis_name: str = "data"):
    """1-D mesh over every addressable chip in the job (all hosts)."""
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
