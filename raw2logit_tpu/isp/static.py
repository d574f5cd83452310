"""Static (non-learnable) ISP with the numpy reference's exact semantics.

Pure-jnp, batched, jit-able — unlike the reference, which runs this per-image
in DataLoader worker processes (pipeline_numpy.py:36-141, train.py:163-171),
we run it batched on-device (or on host CPU via jax cpu backend), so
"static vs parametrized" is a flag, not an execution-site change.
"""

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

from raw2logit_tpu.ops.color import (adjust_gamma, colour_correction,
                                     white_balance)
from raw2logit_tpu.ops.demosaic import DEMOSAIC_FNS
from raw2logit_tpu.ops.filters import (fft_denoise, gaussian_blur_y,
                                       median_filter_y, sharpen_y,
                                       unsharp_mask_y)
from raw2logit_tpu.ops.mosaic import subtract_black_level_cfa

DEBAYER_CHOICES = ("bilinear", "malvar2004", "menon2007")
SHARPENING_CHOICES = ("sharpening_filter", "unsharp_masking")
DENOISING_CHOICES = ("gaussian_denoising", "median_denoising", "fft_denoising")


@dataclasses.dataclass(frozen=True)
class StaticPipeline:
    """Configuration triple mirroring RawProcessingPipeline
    (pipeline_numpy.py:36-67). Callable: raw (B, H, W) -> rgb (B, H, W, 3)."""

    camera_parameters: Tuple[Sequence[float], Sequence[float], Sequence[float]]
    debayer: str = "bilinear"
    sharpening: str = "unsharp_masking"
    # NOTE: the reference class default is denoising='gaussian' which
    # matches NO dispatcher branch and silently applies no denoising
    # (pipeline_numpy.py:40,120-139); its CLI default is
    # 'gaussian_denoising' (train.py:104), which is what we default to —
    # default-CONSTRUCTED pipelines therefore denoise here but not there.
    denoising: str = "gaussian_denoising"

    def __call__(self, raw):
        black_level, wb, ccm = self.camera_parameters
        return static_process(raw, black_level, wb, ccm,
                              debayer=self.debayer,
                              sharpening=self.sharpening,
                              denoising=self.denoising)


def static_process(raw, black_level, wb, ccm,
                   debayer="bilinear",
                   sharpening="unsharp_masking",
                   sharp_radius=1.0, sharp_amount=1.0,
                   denoising="gaussian_denoising",
                   median_kernel_size=3, gaussian_sigma=0.5,
                   fft_fraction=0.3, weight_chambolle=0.01,
                   weight_bregman=100.0, sigma_bilateral=0.6, gamma=2.2):
    """Full static pipeline, mirroring ``processing``
    (pipeline_numpy.py:70-141) stage for stage. Accepts (B, H, W) or (H, W).
    """
    single = raw.ndim == 2
    if single:
        raw = raw[None]

    img = subtract_black_level_cfa(raw, black_level)
    img = DEMOSAIC_FNS[debayer](img)
    img = white_balance(img, wb)
    img = colour_correction(img, ccm)

    if sharpening == "sharpening_filter":
        img = sharpen_y(img)
    elif sharpening == "unsharp_masking":
        img = unsharp_mask_y(img, radius=sharp_radius, amount=sharp_amount)

    if denoising == "gaussian_denoising":
        img = gaussian_blur_y(img, sigma=gaussian_sigma)
    elif denoising == "median_denoising":
        img = median_filter_y(img, size=median_kernel_size)
    elif denoising == "fft_denoising":
        img = fft_denoise(img, keep_fraction=fft_fraction,
                          row_cut=False, column_cut=True)
    elif denoising == "tv_chambolle":
        from raw2logit_tpu.ops.denoise_extra import denoise_tv_chambolle
        img = denoise_tv_chambolle(img, weight=weight_chambolle)
    elif denoising == "tv_bregman":
        from raw2logit_tpu.ops.denoise_extra import denoise_tv_bregman
        img = denoise_tv_bregman(img, weight=weight_bregman)
    elif denoising == "bilateral":
        from raw2logit_tpu.ops.denoise_extra import denoise_bilateral
        img = denoise_bilateral(img, sigma_spatial=sigma_bilateral)

    img = jnp.clip(img, 0.0, 1.0)
    img = adjust_gamma(img, gamma=gamma)

    return img[0] if single else img
