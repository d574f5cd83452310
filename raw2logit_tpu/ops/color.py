"""Pointwise color ops: white balance, CCM, YUV, gamma.

All ops take NHWC ``(B, H, W, 3)`` (or ``(H, W, 3)``) float arrays.
"""

import jax
import jax.numpy as jnp

from raw2logit_tpu.ops import constants


def white_balance(rgb, wb):
    """Per-channel gain. Mirrors the reference's einsum
    ``'bchw,kc->bchw'`` with wb of shape (1, 3) (pipeline_torch.py:190) —
    i.e. a plain broadcast multiply — and ``img * white_balance``
    (pipeline_numpy.py:161-162)."""
    wb = jnp.asarray(wb, dtype=rgb.dtype).reshape(-1)[-3:]
    return rgb * wb


def colour_correction(rgb, ccm):
    """3x3 color-matrix transform: out_k = sum_c M[k, c] * in_c.

    Mirrors einsum ``'bchw,kc->bkhw'`` (pipeline_torch.py:191) and
    ``'ijk,lk->ijl'`` (pipeline_numpy.py:165-167)."""
    ccm = jnp.asarray(ccm, dtype=rgb.dtype).reshape(3, 3)
    return jnp.einsum("...c,kc->...k", rgb, ccm, precision=jax.lax.Precision.HIGHEST)


def rgb_to_yuv(rgb):
    """Rec.601 RGB->YUV (skimage.color.rgb2yuv constants)."""
    m = jnp.asarray(constants.M_RGB_2_YUV, dtype=rgb.dtype)
    return jnp.einsum("...c,kc->...k", rgb, m, precision=jax.lax.Precision.HIGHEST)


def yuv_to_rgb(yuv):
    m = jnp.asarray(constants.M_YUV_2_RGB, dtype=yuv.dtype)
    return jnp.einsum("...c,kc->...k", yuv, m, precision=jax.lax.Precision.HIGHEST)


def adjust_gamma(img, gamma=2.2):
    """Static-pipeline gamma: clip to [0, 1] upstream, then x**(1/gamma)
    (pipeline_numpy.py:241-244)."""
    return img ** (1.0 / gamma)


def clip_gamma_exp(img, gamma):
    """Parametrized-pipeline gamma with a differentiable-gamma trick:
    clip to [1e-5, 1] then ``exp(log(x)/gamma)`` so d/dgamma exists
    (pipeline_torch.py:206-210). Returns (clipped, gamma_corrected)."""
    clipped = jnp.clip(img, 1e-5, 1.0)
    return clipped, jnp.exp(jnp.log(clipped) / gamma)
