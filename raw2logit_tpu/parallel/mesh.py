"""Device mesh + sharding helpers.

The reference is strictly single-device (pl.Trainer(gpus=1), train.py:361).
Here, scaling is a first-class concern: the train step is jit-compiled with a
1-D data mesh over ICI; XLA inserts the gradient all-reduce. The models are
small (ResNet/U-Net++ @ 256x256), so data parallelism is the right (and
sufficient) axis; params are replicated. The sweep dimension (12 pipelines x
folds x augmentations) parallelizes across independent processes/slices over
DCN — see evaluation/abtesting.py.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data"):
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data"):
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device_put a pytree of host arrays with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
