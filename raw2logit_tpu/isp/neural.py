"""Neural ISP: raw -> RGB via a small U-Net++ on the packed mosaic.

Mirrors NNProcessing (processing/pipeline_torch.py:83-126): half-resolution
3-channel packing, optional mosaic normalization, U-Net++ (resnet34 encoder,
depth 3, decoder (256, 128, 64)), optional affine-free output batch norm.
"""

from typing import Optional, Sequence

import flax.linen as nn

from raw2logit_tpu.isp.batchnorm import TorchBatchNorm
from raw2logit_tpu.models.unetpp import UNetPlusPlus
from raw2logit_tpu.ops.mosaic import pack_raw


class NNProcessing(nn.Module):
    batch_norm_output: bool = True
    normalize_mosaic_mean: Optional[Sequence[float]] = None
    normalize_mosaic_std: Optional[Sequence[float]] = None
    encoder_name: str = "resnet34"
    remat: bool = False  # rematerialize the U-Net++ decoder grid nodes

    @nn.compact
    def __call__(self, raw, train: bool = True, taps=None):
        stages = {}

        def stage(name, x):
            if taps is not None and name in taps:
                x = x + taps[name]
            stages[name] = x
            return x

        rgb = pack_raw(raw, reduce_size=True, out_channels=3)
        if self.normalize_mosaic_mean is not None:
            import jax.numpy as jnp
            mean = jnp.asarray(self.normalize_mosaic_mean, rgb.dtype)
            std = jnp.asarray(self.normalize_mosaic_std, rgb.dtype)
            rgb = (rgb - mean) / std
        rgb = stage("demosaic", rgb)

        rgb = UNetPlusPlus(encoder_name=self.encoder_name, encoder_depth=3,
                           decoder_channels=(256, 128, 64), in_channels=3,
                           classes=3, remat=self.remat,
                           name="model")(rgb, train=train)
        if self.batch_norm_output:
            rgb = TorchBatchNorm(name="batch_norm")(
                rgb, use_running_average=not train)
        rgb = stage("rgb", rgb)

        return rgb, stages
