"""CPU golden for elastic_transform: the reference implementation's exact
semantics (cv2.getAffineTransform + warpAffine with BORDER_REFLECT_101,
then scipy gaussian-smoothed displacement + map_coordinates mode='reflect';
hendrycks_robustness.py:398-427) rebuilt here with cv2+scipy and driven
with the SAME random draws as the jnp implementation."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from scipy.ndimage import gaussian_filter, map_coordinates  # noqa: E402

from raw2logit_tpu.evaluation.corruptions import (_affine_from_points,
                                                  _elastic_apply,
                                                  elastic_control_points,
                                                  elastic_severity)


def golden_elastic(image, jitter, dx_noise, dy_noise, c):
    """Reference-semantics elastic on one HWC float32 image."""
    shape = image.shape
    shape_size = shape[:2]
    pts1 = elastic_control_points(*shape_size)
    pts2 = (pts1 + jitter).astype(np.float32)
    M = cv2.getAffineTransform(pts1, pts2)
    image = cv2.warpAffine(image, M, shape_size[::-1],
                           borderMode=cv2.BORDER_REFLECT_101)
    if c[1] > 0:
        dx = (gaussian_filter(dx_noise, c[1], mode="reflect",
                              truncate=3) * c[0]).astype(np.float32)
        dy = (gaussian_filter(dy_noise, c[1], mode="reflect",
                              truncate=3) * c[0]).astype(np.float32)
    else:
        dx = (dx_noise * c[0]).astype(np.float32)
        dy = (dy_noise * c[0]).astype(np.float32)
    dx, dy = dx[..., None], dy[..., None]
    x, y, z = np.meshgrid(np.arange(shape[1]), np.arange(shape[0]),
                          np.arange(shape[2]))
    indices = (np.reshape(y + dy, (-1, 1)), np.reshape(x + dx, (-1, 1)),
               np.reshape(z, (-1, 1)))
    return np.clip(
        map_coordinates(image, indices, order=1,
                        mode="reflect").reshape(shape), 0, 1)


def test_affine_solver_matches_cv2():
    rng = np.random.default_rng(0)
    pts1 = elastic_control_points(64, 64)
    pts2 = (pts1 + rng.uniform(-3, 3, pts1.shape)).astype(np.float32)
    ours = _affine_from_points(pts1, pts2)
    theirs = cv2.getAffineTransform(pts1, pts2)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("severity", [1, 2, 3, 5])
def test_elastic_matches_reference_semantics(severity):
    rng = np.random.default_rng(severity)
    h = w = 64
    img = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32)
    c = elastic_severity(severity)
    jitter = rng.uniform(-c[2], c[2], (3, 2)).astype(np.float32)
    dx_noise = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    dy_noise = rng.uniform(-1, 1, (h, w)).astype(np.float32)

    want = golden_elastic(img, jitter, dx_noise, dy_noise, c)
    got = np.asarray(_elastic_apply(img[None], jitter, dx_noise,
                                    dy_noise, c))[0]
    # bilinear resampling in float32; interior should agree tightly
    assert np.abs(got - want).max() < 5e-3
    assert np.abs(got - want).mean() < 2e-4


# ---- remaining C-battery transforms pinned to independent CPU goldens
# (VERDICT r2 item 3). Deterministic transforms compare against
# scipy/matplotlib re-derivations of the reference's skimage/scipy calls;
# noise transforms get exact invariants + distributional checks with a
# fixed key (seeded, no flakes).

import jax
import jax.numpy as jnp
from scipy.ndimage import zoom as scizoom

from raw2logit_tpu.evaluation import corruptions as C

RNG = np.random.default_rng(42)
IMG = RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32)
KEY = jax.random.key(7)


def _golden_clipped_zoom(img, zf):
    """hendrycks:123-133 verbatim semantics via scipy.ndimage.zoom."""
    h = img.shape[0]
    ch = int(np.ceil(h / zf))
    top = (h - ch) // 2
    img = scizoom(img[top:top + ch, top:top + ch], (zf, zf, 1), order=1)
    trim = (img.shape[0] - h) // 2
    return img[trim:trim + h, trim:trim + h]


@pytest.mark.parametrize("severity", [1, 3, 5])
def test_zoom_blur_matches_scipy_zoom(severity):
    factors = [np.arange(1, 1.06, .01), None, np.arange(1, 1.16, .01),
               None, np.arange(1, 1.26, .01)][severity - 1]
    out = np.zeros_like(IMG)
    for z in factors:
        out += _golden_clipped_zoom(IMG, z)
    want = np.clip((IMG + out) / (len(factors) + 1), 0, 1)
    got = np.asarray(C.zoom_blur(KEY, IMG[None], severity))[0]
    assert np.abs(got - want).max() < 2e-5


@pytest.mark.parametrize("severity", [1, 3, 5])
def test_gaussian_blur_matches_scipy(severity):
    from scipy.ndimage import gaussian_filter
    c = [0.4, 0.6, 0.7, 0.8, 1.0][severity - 1]
    # skimage.filters.gaussian(multichannel=True) == per-channel scipy
    # gaussian_filter, mode='nearest', truncate=4
    want = np.clip(np.stack(
        [gaussian_filter(IMG[..., k], c, mode="nearest", truncate=4.0)
         for k in range(3)], -1), 0, 1)
    got = np.asarray(C.gaussian_blur(KEY, IMG[None], severity))[0]
    assert np.abs(got - want).max() < 2e-6


@pytest.mark.parametrize("severity", [1, 4])
def test_contrast_matches_reference_formula(severity):
    c = [.75, .5, .4, .3, .15][severity - 1]
    means = IMG.mean(axis=(0, 1), keepdims=True)
    want = np.clip((IMG - means) * c + means, 0, 1)
    got = np.asarray(C.contrast(KEY, IMG[None], severity))[0]
    assert np.abs(got - want).max() < 2e-6


@pytest.mark.parametrize("severity", [1, 4, 5])
def test_brightness_matches_matplotlib_hsv(severity):
    """Independent hsv truth source: matplotlib.colors implements the
    same conversion as the reference's skimage rgb2hsv/hsv2rgb."""
    import matplotlib.colors as mcolors
    c = [.05, .1, .15, .2, .3][severity - 1]
    hsv = mcolors.rgb_to_hsv(IMG)
    hsv[..., 2] = np.clip(hsv[..., 2] + c, 0, 1)
    want = np.clip(mcolors.hsv_to_rgb(hsv), 0, 1)
    got = np.asarray(C.brightness(KEY, IMG[None], severity))[0]
    assert np.abs(got - want).max() < 5e-6


@pytest.mark.parametrize("severity", [1, 3, 4, 5])
def test_saturate_matches_matplotlib_hsv(severity):
    import matplotlib.colors as mcolors
    cs = [(0.3, 0), (0.1, 0), (1.5, 0), (2, 0.1), (2.5, 0.2)][severity - 1]
    hsv = mcolors.rgb_to_hsv(IMG)
    hsv[..., 1] = np.clip(hsv[..., 1] * cs[0] + cs[1], 0, 1)
    want = np.clip(mcolors.hsv_to_rgb(hsv), 0, 1)
    got = np.asarray(C.saturate(KEY, IMG[None], severity))[0]
    assert np.abs(got - want).max() < 5e-6


def test_hsv_roundtrip_edge_cases():
    """Grays (delta=0), black (maxc=0), saturated primaries — the places
    a hand-rolled hsv can diverge from skimage semantics."""
    import matplotlib.colors as mcolors
    pts = np.array([[0, 0, 0], [1, 1, 1], [.5, .5, .5], [1, 0, 0],
                    [0, 1, 0], [0, 0, 1], [1, 1, 0], [0.7, 0.7, 0.2],
                    [1e-7, 0, 0]], np.float32).reshape(3, 3, 3)
    ours = np.asarray(C.rgb_to_hsv(jnp.asarray(pts)))
    want = mcolors.rgb_to_hsv(pts)
    np.testing.assert_allclose(ours, want, atol=2e-6)
    back = np.asarray(C.hsv_to_rgb(jnp.asarray(ours)))
    np.testing.assert_allclose(back, pts, atol=2e-6)


def test_gaussian_noise_scale_and_formula():
    """y = clip(x + c*n) with standard-normal n: recover n at sev 5 and
    predict sev 1 exactly (same key -> same draw); std(n) ~ 1."""
    c5, c1 = 0.10, 0.04
    y5 = np.asarray(C.gaussian_noise(KEY, IMG[None], 5))[0]
    y1 = np.asarray(C.gaussian_noise(KEY, IMG[None], 1))[0]
    # mid-range pixels cannot clip (|n| would need to exceed 4), so the
    # recovered draws there are an UNtruncated standard-normal sample
    inner = (IMG > 0.4) & (IMG < 0.6) & (y5 > 0) & (y5 < 1)
    n = (y5 - IMG) / c5
    assert abs(n[inner].std() - 1.0) < 0.04
    assert abs(n[inner].mean()) < 0.03
    pred1 = np.clip(IMG + n * c1, 0, 1)
    assert np.abs(pred1[inner] - y1[inner]).max() < 1e-6


def test_speckle_noise_scale_and_formula():
    """y = clip(x + x*c*n): multiplicative structure distinguishes it
    from gaussian_noise."""
    c5, c2 = 0.2, 0.1
    y5 = np.asarray(C.speckle_noise(KEY, IMG[None], 5))[0]
    y2 = np.asarray(C.speckle_noise(KEY, IMG[None], 2))[0]
    inner = (y5 > 0) & (y5 < 1) & (IMG > 0.05)
    n = (y5 - IMG) / (IMG * c5)
    assert abs(n[inner].std() - 1.0) < 0.03
    pred2 = np.clip(IMG + IMG * n * c2, 0, 1)
    assert np.abs(pred2[inner] - y2[inner]).max() < 1e-5


def test_shot_noise_poisson_semantics():
    """y = clip(poisson(x*c)/c, 0, 1): outputs live on the 1/c grid
    (the reference's int/float dtype behavior), with Poisson mean/var."""
    c = 50  # severity 5
    y = np.asarray(C.shot_noise(KEY, IMG[None], 5))[0]
    unclipped = y < 1.0
    grid = y[unclipped] * c
    assert np.abs(grid - np.round(grid)).max() < 1e-4
    assert abs(y.mean() - np.clip(IMG, 0, 1).mean()) < 0.01
    # variance check away from the clip (x < 0.5 -> clipping at 1 needs
    # a >25-sigma excursion; conditioning on unclipped there is unbiased)
    low = IMG < 0.5
    var = (y - IMG)[low].var()
    want_var = (IMG[low] / c).mean()  # Var[poisson(xc)/c] = x/c
    assert abs(var - want_var) / want_var < 0.1


def test_impulse_noise_salt_pepper_semantics():
    """skimage random_noise(mode='s&p', amount=c): each pixel salted w.p.
    c/2, peppered w.p. c/2, otherwise EXACTLY unchanged."""
    c = 0.07  # severity 5
    y = np.asarray(C.impulse_noise(KEY, IMG[None], 5))[0]
    changed = y != IMG
    salt = changed & (y == 1.0)
    pepper = changed & (y == 0.0)
    # every changed pixel is exactly 0 or 1
    assert np.array_equal(changed, salt | pepper)
    n = IMG.size
    for frac, name in ((salt.mean(), "salt"), (pepper.mean(), "pepper")):
        se = np.sqrt((c / 2) * (1 - c / 2) / n)
        assert abs(frac - c / 2) < 5 * se, (name, frac)


def test_identity_is_exact():
    y = np.asarray(C.identity(KEY, IMG[None], 3))[0]
    np.testing.assert_array_equal(y, IMG)
