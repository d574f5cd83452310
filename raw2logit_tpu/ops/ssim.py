"""Differentiable SSIM, matching the reference's pytorch-ssim
(utils/ssim.py:19-75): 11x11 gaussian window (sigma=1.5), per-channel
(grouped) convs with ZERO padding of window_size//2, C1=0.01^2, C2=0.03^2.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _window_np(window_size: int, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


def _conv_win(img, window):
    """Per-channel window conv of NHWC with zero 'same' padding."""
    c = img.shape[-1]
    k = jnp.asarray(window)[:, :, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)


def ssim(img1, img2, window_size=11, size_average=True):
    """SSIM between two NHWC batches. size_average=True -> scalar mean;
    else per-image mean over (H, W, C)."""
    window = _window_np(int(window_size))
    mu1 = _conv_win(img1, window)
    mu2 = _conv_win(img2, window)

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _conv_win(img1 * img1, window) - mu1_sq
    sigma2_sq = _conv_win(img2 * img2, window) - mu2_sq
    sigma12 = _conv_win(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))

    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
