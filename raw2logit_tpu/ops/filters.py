"""Small-stencil spatial filters on luma (Y) planes and RGB images.

Padding conventions matter for bit-faithfulness and differ per reference
call site; each op documents which numpy/torch mode it mirrors:

  * ``zero``      — torch Conv2d default / scipy convolve2d boundary='fill'
  * ``reflect``   — torch padding_mode='reflect' / np.pad 'reflect'
                    (edge NOT repeated:  dcb|abcd)
  * ``symmetric`` — scipy.ndimage default mode='reflect'
                    (edge repeated:     dcba|abcd)
  * ``edge``      — scipy/skimage mode='nearest' (replicate)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.ops import constants

_PAD_MODES = {"zero": "constant", "reflect": "reflect",
              "symmetric": "symmetric", "edge": "edge"}


def _pad2d(x, ph, pw, pad_mode):
    cfg = [(0, 0)] * (x.ndim - 2) + [(ph, ph), (pw, pw)]
    mode = _PAD_MODES[pad_mode]
    return jnp.pad(x, cfg, mode=mode)


def conv2d_single(x, kernel, pad_mode="zero"):
    """2-D cross-correlation of (..., H, W) planes with a small kernel.

    All reference kernels are symmetric, so correlation == convolution and
    this matches both torch Conv2d (correlation) and scipy convolve.
    """
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    kh, kw = kernel.shape
    xp = _pad2d(x, kh // 2, kw // 2, pad_mode)
    lead = xp.shape[:-2]
    xp = xp.reshape((-1,) + xp.shape[-2:])[..., None]  # (N, H+, W+, 1)
    out = jax.lax.conv_general_dilated(
        xp, kernel[..., None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # fidelity path: never let the backend drop to bf16 accumulation
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[..., 0].reshape(lead + out.shape[1:3])


def conv2d_separable(x, k1d, pad_mode):
    """Separable (outer-product) kernel as two rank-1 passes, padding each
    axis independently with ``pad_mode`` (matches scipy's sequential
    correlate1d application)."""
    k1d = jnp.asarray(k1d, dtype=x.dtype)
    x = conv2d_single(x, k1d[:, None], pad_mode=pad_mode)  # vertical pass
    x = conv2d_single(x, k1d[None, :], pad_mode=pad_mode)  # horizontal pass
    return x


def _on_luma(img, fn):
    """Apply ``fn`` to the Y channel in YUV space; return RGB.

    Mirrors the reference's rgb2yuv -> op on [:, :, 0] -> yuv2rgb pattern
    (pipeline_numpy.py:170-209)."""
    from raw2logit_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
    yuv = rgb_to_yuv(img)
    y = fn(yuv[..., 0])
    yuv = yuv.at[..., 0].set(y)
    return yuv_to_rgb(yuv)


def sharpen_y(img, kernel=None):
    """Fixed 3x3 sharpening on Y, zero padding.

    Mirrors sharpening_filter (pipeline_numpy.py:180-191: convolve2d 'same',
    boundary='fill') and the torch sharpening conv (pipeline_torch.py:162-163,
    default zero padding)."""
    k = constants.K_SHARP if kernel is None else kernel
    return _on_luma(img, lambda y: conv2d_single(y, k, pad_mode="zero"))


def gaussian_blur_y(img, sigma=0.5, pad_mode="symmetric", kernel=None):
    """Gaussian denoise on Y.

    Static path mirrors scipy.ndimage.gaussian_filter(sigma=0.5),
    mode='reflect' == np.pad 'symmetric' (pipeline_numpy.py:203-209).
    The torch path uses the same 5x5 kernel but torch 'reflect' padding
    (pipeline_torch.py:165-166) — pass pad_mode='reflect' and the 2-D kernel.
    """
    if kernel is not None:
        return _on_luma(img, lambda y: conv2d_single(y, kernel, pad_mode=pad_mode))
    radius = int(4.0 * sigma + 0.5)  # scipy truncate=4.0
    k1d = _gauss1d(sigma, radius)
    return _on_luma(img, lambda y: conv2d_separable(y, k1d, pad_mode=pad_mode))


@functools.lru_cache(maxsize=None)
def _gauss1d_np(sigma: float, radius: int):
    # single source of truth in constants (K_BLUR == this at sigma 0.5,
    # radius 2 — the fidelity tests rely on the equivalence)
    return constants._gaussian_1d(sigma, radius)


def _gauss1d(sigma, radius):
    return jnp.asarray(_gauss1d_np(float(sigma), int(radius)))


def gaussian_kernel_1d(sigma, radius=None):
    if radius is None:
        radius = int(4.0 * sigma + 0.5)
    return _gauss1d(sigma, radius)


def gaussian_filter_2d(x, sigma, pad_mode="symmetric", truncate=4.0):
    """scipy.ndimage.gaussian_filter equivalent on (..., H, W) planes."""
    radius = int(truncate * sigma + 0.5)
    return conv2d_separable(x, _gauss1d(sigma, radius), pad_mode=pad_mode)


def unsharp_mask_y(img, radius=1.0, amount=1.0):
    """skimage.filters.unsharp_mask on Y with preserve_range=True:
    y + amount * (y - gaussian(y, sigma=radius, mode='nearest'))
    (pipeline_numpy.py:170-177)."""
    def _f(y):
        blurred = gaussian_filter_2d(y, radius, pad_mode="edge")
        return y + amount * (y - blurred)
    return _on_luma(img, _f)


def median_filter_y(img, size=3):
    """scipy.ndimage.median_filter(size) on Y, mode='reflect' (symmetric
    padding) — pipeline_numpy.py:194-200. Implemented as a gather of the
    size*size shifted planes + sort along the stack axis (rank filter);
    compiles to pure VPU work on TPU."""
    def _f(y):
        r = size // 2
        yp = _pad2d(y, r, r, "symmetric")
        h, w = y.shape[-2], y.shape[-1]
        shifts = [
            yp[..., i:i + h, j:j + w]
            for i in range(size) for j in range(size)
        ]
        stack = jnp.stack(shifts, axis=-1)
        return jnp.sort(stack, axis=-1)[..., (size * size) // 2]
    return _on_luma(img, _f)


def fft_denoise(img, keep_fraction=0.3, row_cut=False, column_cut=True):
    """FFT low-pass over the LAST TWO axes of an (..., H, W, C) image —
    faithfully reproducing the reference quirk that scipy.fftpack.fft2
    transforms axes (-2, -1) = (W, C) of an HWC image, then zeroes
    mid-frequency *W columns* (pipeline_numpy.py:212-238)."""
    # Two 1-D FFTs rather than one fft2: identical math (separable DFT)
    # but a different XLA lowering — under SPMD the partitioner feeds
    # the multi-dim XLA:CPU fft thunk a non-major layout it RET_CHECKs
    # on (fft_thunk.cc:167), which crashed sharded full-frame
    # fft_denoising on the CPU mesh; the 1-D decomposition compiles and
    # matches the unsharded result exactly.
    f = jnp.fft.fft(jnp.fft.fft(img, axis=-1), axis=-2)
    c = img.shape[-2]
    lo, hi = int(c * keep_fraction), int(c * (1 - keep_fraction))
    if row_cut:
        r = img.shape[-3]
        rlo, rhi = int(r * keep_fraction), int(r * (1 - keep_fraction))
        mask_r = (jnp.arange(img.shape[-3]) < rlo) | (jnp.arange(img.shape[-3]) >= rhi)
        f = f * mask_r[:, None, None]
    if column_cut:
        mask = (jnp.arange(c) < lo) | (jnp.arange(c) >= hi)
        f = f * mask[:, None]
    return jnp.real(jnp.fft.ifft(jnp.fft.ifft(f, axis=-2),
                                 axis=-1)).astype(img.dtype)
