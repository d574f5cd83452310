"""Differentiable SSIM, matching the reference's pytorch-ssim
(utils/ssim.py:19-75): 11x11 gaussian window (sigma=1.5), per-channel
(grouped) convs with ZERO padding of window_size//2, C1=0.01^2, C2=0.03^2.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gauss_np(window_size: int, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return g.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _window_np(window_size: int, sigma: float = 1.5) -> np.ndarray:
    g = _gauss_np(window_size, sigma)
    return np.outer(g, g).astype(np.float32)


def _depthwise(img, k):
    c = img.shape[-1]
    k = jnp.asarray(k)[:, :, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)


def _conv_win(img, window_size, separable=True):
    """Per-channel gaussian-window conv of NHWC with zero 'same' padding.

    The window is an outer product (reference utils/ssim.py:9-16 builds it
    as g @ g.T), so the conv factorizes EXACTLY into an 11x1 pass then a
    1x11 pass — zero padding commutes with the factorization. 121 taps ->
    22, and each pass is a short stencil instead of a 2-D window (the
    dense depthwise form runs lane-starved at C=3 on TPU, the same wall
    as the 3-channel conv1). Identical up to float reassociation.
    """
    if separable:
        g = _gauss_np(int(window_size))
        return _depthwise(_depthwise(img, g[:, None]), g[None, :])
    return _depthwise(img, _window_np(int(window_size)))


def ssim(img1, img2, window_size=11, size_average=True, separable=True):
    """SSIM between two NHWC batches. size_average=True -> scalar mean;
    else per-image mean over (H, W, C)."""
    _conv = functools.partial(_conv_win, window_size=int(window_size),
                              separable=separable)
    mu1 = _conv(img1)
    mu2 = _conv(img2)

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _conv(img1 * img1) - mu1_sq
    sigma2_sq = _conv(img2 * img2) - mu2_sq
    sigma12 = _conv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))

    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
