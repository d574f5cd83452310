from raw2logit_tpu.tracking.run import (Run, find_run, get_model_by_name,
                                        list_runs, start_run)
from raw2logit_tpu.tracking.images import (save_image_grid, stage_gradients,
                                           track_images)

__all__ = ["Run", "start_run", "find_run", "get_model_by_name", "list_runs",
           "track_images", "stage_gradients", "save_image_grid"]
