"""Independent numpy/scipy golden implementations of the ISP math.

These reproduce the exact library semantics the reference relies on
(scipy.ndimage / scipy.signal / skimage / colour_demosaicing), implemented
directly from those libraries' documented behaviour, and serve as the truth
source for the jnp ops tests. They are deliberately written against scipy
(a different backend than the jnp implementations under test).
"""

import numpy as np
from scipy import ndimage
from scipy.signal import convolve2d

# Rec.601 YUV (skimage.color constants)
YUV_FROM_RGB = np.array(
    [[0.299, 0.587, 0.114],
     [-0.14714119, -0.28886916, 0.43601035],
     [0.61497538, -0.51496512, -0.10001026]])
RGB_FROM_YUV = np.linalg.inv(YUV_FROM_RGB)


def rgb2yuv(img):
    return img @ YUV_FROM_RGB.T


def yuv2rgb(img):
    return img @ RGB_FROM_YUV.T


def bayer_masks(shape):
    h, w = shape
    r = np.zeros((h, w)); g = np.zeros((h, w)); b = np.zeros((h, w))
    r[0::2, 0::2] = 1
    g[0::2, 1::2] = 1
    g[1::2, 0::2] = 1
    b[1::2, 1::2] = 1
    return r, g, b


def remove_blacklv(img, black_level):
    img = img.copy()
    img[0::2, 0::2] -= black_level[0]
    img[0::2, 1::2] -= black_level[1]
    img[1::2, 0::2] -= black_level[2]
    img[1::2, 1::2] -= black_level[3]
    return img


def demosaic_bilinear(cfa):
    """colour_demosaicing bilinear: masked-plane convolution with the
    averaging stencils, scipy.ndimage.convolve default mode='reflect'."""
    r_m, g_m, b_m = bayer_masks(cfa.shape)
    h_g = np.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]]) / 4
    h_rb = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]]) / 4
    r = ndimage.convolve(cfa * r_m, h_rb)
    g = ndimage.convolve(cfa * g_m, h_g)
    b = ndimage.convolve(cfa * b_m, h_rb)
    return np.stack([r, g, b], axis=-1)


def demosaic_malvar2004(cfa):
    gr_gb = np.array(
        [[0, 0, -1, 0, 0], [0, 0, 2, 0, 0], [-1, 2, 4, 2, -1],
         [0, 0, 2, 0, 0], [0, 0, -1, 0, 0]], dtype=float) / 8
    rg_rb_bg_br = np.array(
        [[0, 0, 0.5, 0, 0], [0, -1, 0, -1, 0], [-1, 4, 5, 4, -1],
         [0, -1, 0, -1, 0], [0, 0, 0.5, 0, 0]], dtype=float) / 8
    rg_br_bg_rb = rg_rb_bg_br.T
    rb_bb_br_rr = np.array(
        [[0, 0, -1.5, 0, 0], [0, 2, 0, 2, 0], [-1.5, 0, 6, 0, -1.5],
         [0, 2, 0, 2, 0], [0, 0, -1.5, 0, 0]], dtype=float) / 8

    r_m, g_m, b_m = bayer_masks(cfa.shape)
    h, w = cfa.shape
    r_rows = (np.arange(h) % 2 == 0)[:, None] * np.ones((1, w), bool)
    r_cols = (np.arange(w) % 2 == 0)[None, :] * np.ones((h, 1), bool)
    b_rows, b_cols = ~r_rows, ~r_cols

    g = np.where(g_m == 1, cfa, ndimage.convolve(cfa, gr_gb))
    rbg_h = ndimage.convolve(cfa, rg_rb_bg_br)
    rbg_v = ndimage.convolve(cfa, rg_br_bg_rb)
    rb_diag = ndimage.convolve(cfa, rb_bb_br_rr)

    r = cfa * r_m
    r = np.where(r_rows & b_cols, rbg_h, r)
    r = np.where(b_rows & r_cols, rbg_v, r)
    r = np.where(b_m == 1, rb_diag, r)
    b = cfa * b_m
    b = np.where(b_rows & r_cols, rbg_h, b)
    b = np.where(r_rows & b_cols, rbg_v, b)
    b = np.where(r_m == 1, rb_diag, b)
    return np.stack([r, g, b], axis=-1)


def _cnv_h(x, k):
    return ndimage.convolve1d(x, k, axis=1, mode="mirror")


def _cnv_v(x, k):
    return ndimage.convolve1d(x, k, axis=0, mode="mirror")


def demosaic_menon2007(cfa, refining_step=True):
    h0 = np.array([0.0, 0.5, 0.0, 0.5, 0.0])
    h1 = np.array([-0.25, 0.0, 0.5, 0.0, -0.25])
    kb = np.array([0.5, 0.0, 0.5])
    fir = np.ones(3) / 3

    h, w = cfa.shape
    r_m, g_m, b_m = bayer_masks(cfa.shape)
    r_rows = (np.arange(h) % 2 == 0)[:, None] * np.ones((1, w), bool)
    r_cols = (np.arange(w) % 2 == 0)[None, :] * np.ones((h, 1), bool)
    b_rows, b_cols = ~r_rows, ~r_cols

    r0, g0, b0 = cfa * r_m, cfa * g_m, cfa * b_m

    g_h = np.where(g_m == 0, _cnv_h(cfa, h0) + _cnv_h(cfa, h1), g0)
    g_v = np.where(g_m == 0, _cnv_v(cfa, h0) + _cnv_v(cfa, h1), g0)

    c_h = np.where(r_m == 1, r0 - g_h, 0.0)
    c_h = np.where(b_m == 1, b0 - g_h, c_h)
    c_v = np.where(r_m == 1, r0 - g_v, 0.0)
    c_v = np.where(b_m == 1, b0 - g_v, c_v)

    d_h = np.abs(c_h - np.pad(c_h, ((0, 0), (0, 2)), mode="reflect")[:, 2:])
    d_v = np.abs(c_v - np.pad(c_v, ((0, 2), (0, 0)), mode="reflect")[2:, :])

    k = np.array([[0.0, 0, 1, 0, 1],
                  [0, 0, 0, 1, 0],
                  [0, 0, 3, 0, 3],
                  [0, 0, 0, 1, 0],
                  [0, 0, 1, 0, 1]])
    sum_h = ndimage.convolve(d_h, k, mode="constant")
    sum_v = ndimage.convolve(d_v, k.T, mode="constant")

    m = sum_v >= sum_h
    g = np.where(m, g_h, g_v)

    r = r0
    r = np.where((g_m == 1) & r_rows, g + _cnv_h(r0, kb) - _cnv_h(g, kb), r)
    r = np.where((g_m == 1) & b_rows, g + _cnv_v(r0, kb) - _cnv_v(g, kb), r)
    b = b0
    b = np.where((g_m == 1) & b_rows, g + _cnv_h(b0, kb) - _cnv_h(g, kb), b)
    b = np.where((g_m == 1) & r_rows, g + _cnv_v(b0, kb) - _cnv_v(g, kb), b)

    r = np.where(b_rows & (b_m == 1),
                 np.where(m, b + _cnv_h(r, kb) - _cnv_h(b, kb),
                          b + _cnv_v(r, kb) - _cnv_v(b, kb)), r)
    b = np.where(r_rows & (r_m == 1),
                 np.where(m, r + _cnv_h(b, kb) - _cnv_h(r, kb),
                          r + _cnv_v(b, kb) - _cnv_v(r, kb)), b)

    if refining_step:
        # 1) G at R/B sites
        r_g, b_g = r - g, b - g
        b_g_m = np.where(b_m == 1, np.where(m, _cnv_h(b_g, fir),
                                            _cnv_v(b_g, fir)), 0.0)
        r_g_m = np.where(r_m == 1, np.where(m, _cnv_h(r_g, fir),
                                            _cnv_v(r_g, fir)), 0.0)
        g = np.where(r_m == 1, r - r_g_m, g)
        g = np.where(b_m == 1, b - b_g_m, g)
        # 2) R/B at G sites
        r_g, b_g = r - g, b - g
        r_g_m = np.where((g_m == 1) & b_rows, _cnv_v(r_g, kb), r_g_m)
        r = np.where((g_m == 1) & b_rows, g + r_g_m, r)
        r_g_m = np.where((g_m == 1) & b_cols, _cnv_h(r_g, kb), r_g_m)
        r = np.where((g_m == 1) & b_cols, g + r_g_m, r)
        b_g_m = np.where((g_m == 1) & r_rows, _cnv_v(b_g, kb), b_g_m)
        b = np.where((g_m == 1) & r_rows, g + b_g_m, b)
        b_g_m = np.where((g_m == 1) & r_cols, _cnv_h(b_g, kb), b_g_m)
        b = np.where((g_m == 1) & r_cols, g + b_g_m, b)
        # 3) R at B sites / B at R sites
        r_g, b_g = r - g, b - g
        r_g_m = np.where(b_m == 1, np.where(m, _cnv_h(r_g, kb),
                                            _cnv_v(r_g, kb)), r_g_m)
        r = np.where(b_m == 1, g + r_g_m, r)
        b_g_m = np.where(r_m == 1, np.where(m, _cnv_h(b_g, kb),
                                            _cnv_v(b_g, kb)), b_g_m)
        b = np.where(r_m == 1, g + b_g_m, b)

    return np.stack([r, g, b], axis=-1)


DEMOSAIC = {"bilinear": demosaic_bilinear,
            "malvar2004": demosaic_malvar2004,
            "menon2007": demosaic_menon2007}


def sharpening_filter(img):
    k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]])
    yuv = rgb2yuv(img)
    yuv[:, :, 0] = convolve2d(yuv[:, :, 0], k, "same",
                              boundary="fill", fillvalue=0)
    return yuv2rgb(yuv)


def unsharp_masking(img, radius=1.0, amount=1.0):
    """skimage.filters.unsharp_mask with preserve_range=True on Y."""
    yuv = rgb2yuv(img)
    y = yuv[:, :, 0]
    blurred = ndimage.gaussian_filter(y, radius, mode="nearest")
    yuv[:, :, 0] = y + amount * (y - blurred)
    return yuv2rgb(yuv)


def gaussian_denoising(img, sigma=0.5):
    yuv = rgb2yuv(img)
    yuv[:, :, 0] = ndimage.gaussian_filter(yuv[:, :, 0], sigma)
    return yuv2rgb(yuv)


def median_denoising(img, size=3):
    yuv = rgb2yuv(img)
    yuv[:, :, 0] = ndimage.median_filter(yuv[:, :, 0], size)
    return yuv2rgb(yuv)


def fft_denoising(img, keep_fraction=0.3, row_cut=False, column_cut=True):
    from scipy import fftpack
    f = fftpack.fft2(img)
    r, c, _ = f.shape
    if row_cut:
        f[int(r * keep_fraction):int(r * (1 - keep_fraction))] = 0
    if column_cut:
        f[:, int(c * keep_fraction):int(c * (1 - keep_fraction))] = 0
    return fftpack.ifft2(f).real


def static_pipeline(img, black_level, white_balance, colour_matrix,
                    debayer="bilinear", sharpening="unsharp_masking",
                    denoising="gaussian_denoising", gamma=2.2):
    img = remove_blacklv(img.astype(np.float64), black_level)
    img = DEMOSAIC[debayer](img)
    img = img * np.asarray(white_balance)
    ccm = np.asarray(colour_matrix).reshape(3, 3)
    img = np.einsum("ijk,lk->ijl", img, ccm)
    if sharpening == "sharpening_filter":
        img = sharpening_filter(img)
    elif sharpening == "unsharp_masking":
        img = unsharp_masking(img)
    if denoising == "gaussian_denoising":
        img = gaussian_denoising(img)
    elif denoising == "median_denoising":
        img = median_denoising(img)
    elif denoising == "fft_denoising":
        img = fft_denoising(img)
    img = np.clip(img, 0, 1)
    return img ** (1.0 / gamma)
