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
