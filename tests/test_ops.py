"""Golden tests: jnp ISP ops vs independent scipy/numpy implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage
from scipy.signal import convolve2d

import golden_numpy as gold
from raw2logit_tpu.ops import (
    adjust_gamma, colour_correction, conv2d_single, demosaic_bilinear_cfa,
    demosaic_malvar2004, demosaic_menon2007, fft_denoise, gaussian_filter_2d,
    median_filter_y, pack_raw, rgb_to_yuv, sharpen_y, ssim,
    subtract_black_level_cfa, unsharp_mask_y, white_balance, yuv_to_rgb,
    gaussian_blur_y,
)
from raw2logit_tpu.ops.constants import K_BLUR


def test_pack_raw_reduce(raw_batch):
    out = np.asarray(pack_raw(jnp.asarray(raw_batch), reduce_size=True))
    assert out.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(out[:, :, :, 0], raw_batch[:, 0::2, 0::2])
    g = (raw_batch[:, 0::2, 1::2] + raw_batch[:, 1::2, 0::2]) / 2
    np.testing.assert_allclose(out[:, :, :, 1], g)
    np.testing.assert_allclose(out[:, :, :, 2], raw_batch[:, 1::2, 1::2])


def test_pack_raw_scatter_black_level(raw_batch):
    bl = [0.01, 0.02, 0.03, 0.04]
    out = np.asarray(pack_raw(jnp.asarray(raw_batch), black_level=bl,
                              reduce_size=False))
    assert out.shape == (4, 64, 64, 3)
    np.testing.assert_allclose(out[:, 0::2, 0::2, 0],
                               raw_batch[:, 0::2, 0::2] - 0.01, rtol=1e-6)
    np.testing.assert_allclose(out[:, 1::2, 0::2, 1],
                               raw_batch[:, 1::2, 0::2] - 0.03, rtol=1e-6)
    # zeros at non-sites
    assert np.all(out[:, 1::2, :, 0] == 0)
    assert np.all(out[:, 0::2, 0::2, 1] == 0)


def test_pack_raw_4ch(raw_batch):
    out = np.asarray(pack_raw(jnp.asarray(raw_batch), reduce_size=True,
                              out_channels=4))
    assert out.shape == (4, 32, 32, 4)
    np.testing.assert_allclose(out[..., 1], raw_batch[:, 0::2, 1::2])
    np.testing.assert_allclose(out[..., 2], raw_batch[:, 1::2, 0::2])


def test_subtract_black_level(raw_image):
    bl = [0.1, 0.2, 0.3, 0.4]
    got = np.asarray(subtract_black_level_cfa(jnp.asarray(raw_image[None]), bl))[0]
    want = gold.remove_blacklv(raw_image, bl)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("name,jfn,gfn", [
    ("bilinear", demosaic_bilinear_cfa, gold.demosaic_bilinear),
    ("malvar2004", demosaic_malvar2004, gold.demosaic_malvar2004),
    ("menon2007", demosaic_menon2007, gold.demosaic_menon2007),
])
def test_demosaic_golden(raw_image, name, jfn, gfn):
    got = np.asarray(jfn(jnp.asarray(raw_image)))
    want = gfn(raw_image.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-5,
                               err_msg=f"demosaic {name} mismatch")


def test_demosaic_preserves_known_sites(raw_image):
    # interior only: border sites are affected by padding in every algorithm
    for fn in (demosaic_bilinear_cfa, demosaic_malvar2004, demosaic_menon2007):
        out = np.asarray(fn(jnp.asarray(raw_image)))[4:-4, 4:-4]
        inner = raw_image[4:-4, 4:-4]
        np.testing.assert_allclose(out[0::2, 0::2, 0], inner[0::2, 0::2],
                                   atol=1e-5)
        np.testing.assert_allclose(out[1::2, 1::2, 2], inner[1::2, 1::2],
                                   atol=1e-5)


def test_yuv_roundtrip(rng):
    img = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    back = np.asarray(yuv_to_rgb(rgb_to_yuv(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, atol=1e-5)
    want = gold.rgb2yuv(img.astype(np.float64))
    np.testing.assert_allclose(np.asarray(rgb_to_yuv(jnp.asarray(img))),
                               want, atol=1e-5)


def test_white_balance_and_ccm(rng):
    img = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    wb = [2.8, 1.0, 1.7]
    got = np.asarray(white_balance(jnp.asarray(img), wb))
    np.testing.assert_allclose(got, img * np.asarray(wb), rtol=1e-6)

    ccm = rng.uniform(size=9).astype(np.float32)
    got = np.asarray(colour_correction(jnp.asarray(img), ccm))
    want = np.einsum("bijk,lk->bijl", img, ccm.reshape(3, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharpen_golden(rng):
    img = rng.uniform(size=(16, 16, 3))
    got = np.asarray(sharpen_y(jnp.asarray(img, dtype=jnp.float32)))
    want = gold.sharpening_filter(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_filter_golden(rng):
    x = rng.uniform(size=(24, 24))
    for sigma in (0.5, 1.0, 1.5):
        got = np.asarray(gaussian_filter_2d(jnp.asarray(x, jnp.float32), sigma))
        want = ndimage.gaussian_filter(x, sigma)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_denoise_golden(rng):
    img = rng.uniform(size=(16, 16, 3))
    got = np.asarray(gaussian_blur_y(jnp.asarray(img, jnp.float32), sigma=0.5))
    want = gold.gaussian_denoising(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_blur_torch_kernel_matches_sigma05():
    """The parametrized pipeline's 5x5 K_BLUR equals scipy's sigma=0.5
    truncated kernel (the reference hardcodes a 5-digit rounding of it)."""
    imp = np.zeros((11, 11))
    imp[5, 5] = 1.0
    want = ndimage.gaussian_filter(imp, 0.5)
    np.testing.assert_allclose(K_BLUR, want[3:8, 3:8], atol=1e-7)


def test_median_golden(rng):
    img = rng.uniform(size=(16, 16, 3))
    got = np.asarray(median_filter_y(jnp.asarray(img, jnp.float32), size=3))
    want = gold.median_denoising(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unsharp_golden(rng):
    img = rng.uniform(size=(16, 16, 3))
    got = np.asarray(unsharp_mask_y(jnp.asarray(img, jnp.float32)))
    want = gold.unsharp_masking(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fft_denoise_golden(rng):
    img = rng.uniform(size=(16, 16, 3))
    got = np.asarray(fft_denoise(jnp.asarray(img, jnp.float32)))
    want = gold.fft_denoising(img.copy())
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gamma():
    img = jnp.asarray([[0.0, 0.25, 1.0]])
    got = np.asarray(adjust_gamma(img, 2.2))
    np.testing.assert_allclose(got, np.asarray([[0.0, 0.25, 1.0]]) ** (1 / 2.2),
                               rtol=1e-5)


def test_conv2d_single_matches_convolve2d(rng):
    x = rng.uniform(size=(12, 12))
    k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], dtype=float)
    got = np.asarray(conv2d_single(jnp.asarray(x, jnp.float32), k, "zero"))
    want = convolve2d(x, k, "same", boundary="fill", fillvalue=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ssim_basics(rng):
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    s_same = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    assert s_same > 0.9999
    noisy = img + rng.normal(scale=0.1, size=img.shape).astype(np.float32)
    s_noisy = float(ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert s_noisy < s_same
    per_img = np.asarray(ssim(jnp.asarray(img), jnp.asarray(noisy),
                              size_average=False))
    assert per_img.shape == (2,)


def test_ssim_separable_matches_dense(rng):
    """The default separable window factorization (11x1 then 1x11) is the
    outer-product identity of the reference's 2-D window (utils/ssim.py:
    9-16) — values AND gradients match the dense form to reassociation
    noise, including at the zero-padded borders."""
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), jnp.float32)
    s_sep, g_sep = jax.value_and_grad(lambda x: ssim(a, x))(b)
    s_dense, g_dense = jax.value_and_grad(
        lambda x: ssim(a, x, separable=False))(b)
    np.testing.assert_allclose(float(s_sep), float(s_dense), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sep), np.asarray(g_dense),
                               atol=1e-6)


def test_tv_chambolle_denoises(rng):
    from raw2logit_tpu.ops.denoise_extra import denoise_tv_chambolle
    clean = np.tile(np.array([[0.2]]), (16, 16))
    clean[4:12, 4:12] = 0.8
    noisy = clean + rng.normal(0, 0.05, clean.shape)
    img = jnp.asarray(noisy, jnp.float32)[..., None].repeat(3, -1)
    out = np.asarray(denoise_tv_chambolle(img, weight=0.1, n_iter_max=50))

    def tv(x):
        return np.abs(np.diff(x, axis=0)).sum() + np.abs(np.diff(x, axis=1)).sum()

    assert tv(out[..., 0]) < tv(noisy)           # total variation reduced
    assert np.abs(out[..., 0] - clean).mean() < np.abs(noisy - clean).mean()


def test_tv_bregman_denoises(rng):
    from raw2logit_tpu.ops.denoise_extra import denoise_tv_bregman
    clean = np.tile(np.array([[0.3]]), (16, 16))
    clean[6:10, :] = 0.7
    noisy = clean + rng.normal(0, 0.05, clean.shape)
    img = jnp.asarray(noisy, jnp.float32)[..., None].repeat(3, -1)
    out = np.asarray(denoise_tv_bregman(img, weight=20.0, max_iter=30))
    assert np.abs(out[..., 0] - clean).mean() < np.abs(noisy - clean).mean()
    assert np.all(np.isfinite(out))


def test_bilateral_edge_preserving(rng):
    from raw2logit_tpu.ops.denoise_extra import denoise_bilateral
    clean = np.zeros((16, 16)); clean[:, 8:] = 1.0
    noisy = clean + rng.normal(0, 0.03, clean.shape)
    img = jnp.asarray(noisy, jnp.float32)[..., None].repeat(3, -1)
    out = np.asarray(denoise_bilateral(img, sigma_color=0.1,
                                       sigma_spatial=1.0))
    # noise reduced on flat regions
    assert out[..., 0][:, :6].std() < noisy[:, :6].std()
    # edge magnitude preserved (not blurred away)
    edge = out[..., 0][:, 8].mean() - out[..., 0][:, 7].mean()
    assert edge > 0.7
