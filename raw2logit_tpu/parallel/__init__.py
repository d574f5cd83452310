from raw2logit_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                         replicated_sharding, shard_batch)
from raw2logit_tpu.parallel.pipelines import process_pipeline_grid
from raw2logit_tpu.parallel.spatial import (process_full_frames,
                                            spatial_sharding)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "spatial_sharding", "process_full_frames",
           "process_pipeline_grid"]
