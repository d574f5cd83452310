"""U-Net++ (nested U-Net) with a ResNet encoder, in flax (NHWC).

Capability parity with the reference's segmentation_models_pytorch
UnetPlusPlus usage:
  * task segmenter: resnet encoder, encoder_depth=5, classes=1
    (train.py:218-225)
  * neural ISP: resnet34 encoder, encoder_depth=3,
    decoder_channels=(256, 128, 64), 3->3 channels
    (processing/pipeline_torch.py:97-103)

Design (Zhou et al. 2018): dense grid of nodes X[i][j]; X[i][0] are encoder
features at scale 1/2^i (row 0 = input resolution); X[i][j] for j>=1 is a
conv block over the concat of all X[i][<j] plus the 2x-upsampled
X[i+1][j-1]. Output head reads X[0][depth].
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from raw2logit_tpu.models.resnet import RESNET_CONFIGS, ResNet


def _upsample2x(x):
    """Nearest-neighbour 2x upsample (TPU-friendly: pure reshape/broadcast)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvBlock(nn.Module):
    """Conv3x3-BN-ReLU x2 (smp DecoderBlock equivalent)."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for k in range(2):
            x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{k}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{k}")(x)
            x = nn.relu(x)
        return x


class UNetPlusPlus(nn.Module):
    """remat=True rematerializes each decoder grid node: the backward pass
    recomputes the node's conv-BN-relu internals from its concat input
    instead of reading saved activations — exact same math, trading MXU
    recompute (idle at this family's 11-27% MFU) for HBM activation
    traffic (the measured bound, 65-74% util)."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    in_channels: int = 3
    classes: int = 1
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert len(self.decoder_channels) == self.encoder_depth
        block_fn = (nn.remat(ConvBlock, static_argnums=(2,))
                    if self.remat else ConvBlock)
        block_cls, stage_sizes = RESNET_CONFIGS[self.encoder_name.lower()]
        encoder = ResNet(block_cls=block_cls, stage_sizes=stage_sizes,
                         num_classes=1, in_channels=self.in_channels,
                         dtype=self.dtype, name="encoder")
        feats = encoder(x, train=train, return_features=True,
                        depth=self.encoder_depth)

        d = self.encoder_depth
        # row i (scale 1/2^i) -> decoder channel count for its j>=1 nodes
        row_ch = list(self.decoder_channels)[::-1]  # row 0 gets last entry

        grid = {(i, 0): feats[i] for i in range(d + 1)}
        for j in range(1, d + 1):
            for i in range(0, d + 1 - j):
                skips = [grid[(i, k)] for k in range(j)]
                up = _upsample2x(grid[(i + 1, j - 1)])
                y = jnp.concatenate(skips + [up], axis=-1)
                # i <= d - j <= d - 1 here, so row i always indexes
                # decoder_channels directly
                y = block_fn(row_ch[i], dtype=self.dtype,
                             name=f"x_{i}_{j}")(y, train)
                grid[(i, j)] = y

        out = nn.Conv(self.classes, (3, 3), padding="SAME",
                      dtype=jnp.float32, name="segmentation_head")(grid[(0, d)])
        return out
