"""Identity / mosaic-only processor (processing_mode='none').

Mirrors RawToRGB (pipeline_torch.py:43-80): only the raw->color-plane
packing, optionally normalized. Used as an ablation baseline.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from raw2logit_tpu.ops.mosaic import pack_raw


class RawToRGB(nn.Module):
    reduce_size: bool = True
    out_channels: int = 3
    normalize_mosaic_mean: Optional[Sequence[float]] = None
    normalize_mosaic_std: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, raw, train: bool = True, taps=None):
        stages = {}
        rgb = pack_raw(raw, reduce_size=self.reduce_size,
                       out_channels=self.out_channels)
        if taps is not None and "demosaic" in taps:
            rgb = rgb + taps["demosaic"]
        stages["demosaic"] = rgb
        if self.normalize_mosaic_mean is not None:
            mean = jnp.asarray(self.normalize_mosaic_mean, rgb.dtype)
            std = jnp.asarray(self.normalize_mosaic_std, rgb.dtype)
            rgb = (rgb - mean) / std
        return rgb, stages
