"""Spatial (within-image) sharding for full-frame ISP processing.

The reference tiles large drone frames to 256x256 before anything touches
them (dataset.py:227-247) because its per-image numpy ISP is single-core.
On a TPU mesh the natural alternative is to process FULL frames with the
image's row dimension sharded across devices: every ISP stage is a stencil
(conv) or pointwise op, so XLA's SPMD partitioner inserts the exact halo
exchanges (collective-permutes) a hand-written decomposition would need —
with global boundary padding handled correctly, which a manual
block-with-halo scheme gets wrong at the true image borders.

This is the framework's SP axis: batch DP shards dim 0, spatial SP shards
the row dim. Use it when frames are too large or too few to fill a batch
mesh (e.g. 4 drone frames of 3000x4000 over 8 chips).

Note: fft_denoising is a global-frequency op — it still works (XLA
all-gathers the rows) but gains nothing from SP.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, axis_name: str = "data"):
    """(B, H, W[, C]) arrays sharded over rows (H) across the mesh."""
    return NamedSharding(mesh, P(None, axis_name))


def process_full_frames(pipeline, mesh, raw, axis_name: str = "data",
                        donate: bool = False):
    """Run an image->image pipeline (e.g. StaticPipeline, or a closed
    ParametrizedProcessing apply) over full frames with rows sharded
    across the mesh.

    raw: (B, H, W) host or device array; H must be divisible by the mesh
    size for an even split (XLA pads internally otherwise).
    Returns the processed frames with the same row sharding.
    """
    shard = spatial_sharding(mesh, axis_name)
    raw = jax.device_put(raw, shard)
    fn = jax.jit(lambda r: pipeline(r),
                 out_shardings=shard,
                 donate_argnums=(0,) if donate else ())
    return fn(raw)
