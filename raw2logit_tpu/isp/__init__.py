"""ISP processors: raw (B, H, W) -> RGB (B, H, W, 3), NHWC.

Every processor is a flax module (or pure function) returning
``(rgb, stages)`` where ``stages`` is an ordered dict of named intermediate
tensors — the functional replacement for the reference's stateful
``self.stages`` protocol (processing/pipeline_torch.py:178-223). Stage names
match the reference contract: demosaic, color_correct, sharpening, gaussian,
clipped, gamma_correct, noise, rgb.

Per-stage input-gradients are obtained by differentiating w.r.t. zero-valued
``taps`` added after each stage (see tracking.stage_gradients), replacing
torch ``retain_grad``.
"""

from raw2logit_tpu.isp.parametrized import (
    ParametrizedProcessing,
    default_camera_params,
)
from raw2logit_tpu.isp.static import StaticPipeline, static_process
from raw2logit_tpu.isp.identity import RawToRGB
from raw2logit_tpu.isp.neural import NNProcessing

STAGE_NAMES = ["demosaic", "color_correct", "sharpening", "gaussian",
               "clipped", "gamma_correct", "noise", "rgb"]

__all__ = [
    "ParametrizedProcessing",
    "StaticPipeline",
    "static_process",
    "RawToRGB",
    "NNProcessing",
    "STAGE_NAMES",
    "default_camera_params",
]
