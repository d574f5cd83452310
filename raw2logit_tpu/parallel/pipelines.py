"""Pipeline-axis (EP-style) sharding of the drift-synthesis grid.

The reference generates its pipeline-processed dataset variants by running
the per-image numpy ISP sequentially over the 12-pipeline grid inside
DataLoader workers (SURVEY §3.1 HOT LOOP 1; figures/train.sh:52-81 drives
the grid one configuration at a time). The single-chip TPU form is one
jitted program computing every variant of a raw batch
(tools/static_isp_micro.py). This module adds the scaling axis: the
PIPELINE dimension sharded across a device mesh — each device materializes
only its own grid slice, the expert-parallel analog for this workload
(the "experts" are heterogeneous ISP configurations).

Mechanics: the grid's pipelines differ structurally (different
demosaic/sharpen/denoise ops), so SPMD needs one program containing all
variants with a data-dependent choice: ``lax.switch`` over a sharded
pipeline-index vector inside ``shard_map``. ``lax.switch`` executes ONE
branch at runtime, so each device pays only for its assigned pipelines.
(A vmap-of-switch formulation would NOT work: vmap lowers switch to
computing every branch and selecting.) ``lax.map`` keeps the per-device
loop sequential, preserving the switch semantics.

Static assignment cannot balance heterogeneous pipeline costs perfectly
(menon2007 is ~4x bilinear); interleave the grid order if it matters.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_pipeline_grid(pipelines, mesh: Mesh, raw,
                          axis_name: str = "data"):
    """Every pipeline variant of ``raw``, pipeline axis sharded over the
    mesh.

    pipelines: sequence of image->RGB callables with identical output
        shapes (e.g. the 12 ``StaticPipeline`` grid configurations).
    raw: (B, H, W) mosaic batch, replicated to every device.

    Returns a (len(pipelines), B, 3, H, W) array sharded on axis 0 —
    planar channel layout, matching the program-output contract (a
    channel-last output pays a 42x tiled-copy HBM blowup on the remote
    backend; ROUND3_NOTES.md).
    """
    n_dev = mesh.devices.size
    n_pipes = len(pipelines)
    if n_pipes == 0:
        raise ValueError("no pipelines")
    # pad the index vector to a multiple of the mesh size; padded slots
    # recompute pipeline 0 and are sliced off after the gather
    pad = (-n_pipes) % n_dev
    idx = jnp.concatenate([jnp.arange(n_pipes, dtype=jnp.int32),
                           jnp.zeros((pad,), jnp.int32)])

    branches = [lambda r, p=p: jnp.transpose(p(r), (0, 3, 1, 2))
                for p in pipelines]

    def shard_fn(local_idx, r):
        return jax.lax.map(lambda i: jax.lax.switch(i, branches, r),
                           local_idx)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(axis_name), P()), out_specs=P(axis_name))

    @jax.jit
    def run(idx, r):
        return fn(idx, r)[:n_pipes]

    raw = jax.device_put(raw, NamedSharding(mesh, P()))
    idx = jax.device_put(idx, NamedSharding(mesh, P(axis_name)))
    return run(idx, raw)
