"""Pure-jnp ISP ops with exact reference semantics.

Each op documents the reference call site it reproduces
(file:line into /root/reference) and the padding convention used, since
padding is where the reference's numpy and torch paths differ.
"""

from raw2logit_tpu.ops.mosaic import pack_raw, subtract_black_level_cfa
from raw2logit_tpu.ops.color import (
    white_balance,
    colour_correction,
    rgb_to_yuv,
    yuv_to_rgb,
    adjust_gamma,
    clip_gamma_exp,
)
from raw2logit_tpu.ops.filters import (
    conv2d_single,
    sharpen_y,
    gaussian_blur_y,
    gaussian_kernel_1d,
    gaussian_filter_2d,
    unsharp_mask_y,
    median_filter_y,
    fft_denoise,
)
from raw2logit_tpu.ops.demosaic import (
    demosaic_bilinear_cfa,
    demosaic_malvar2004,
    demosaic_menon2007,
    debayer_mosaic_bilinear,
)
from raw2logit_tpu.ops.ssim import ssim

__all__ = [
    "pack_raw",
    "subtract_black_level_cfa",
    "white_balance",
    "colour_correction",
    "rgb_to_yuv",
    "yuv_to_rgb",
    "adjust_gamma",
    "clip_gamma_exp",
    "conv2d_single",
    "sharpen_y",
    "gaussian_blur_y",
    "gaussian_kernel_1d",
    "gaussian_filter_2d",
    "unsharp_mask_y",
    "median_filter_y",
    "fft_denoise",
    "demosaic_bilinear_cfa",
    "demosaic_malvar2004",
    "demosaic_menon2007",
    "debayer_mosaic_bilinear",
    "ssim",
]
