"""Tests: augmentation replay, losses, metrics, corruptions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw2logit_tpu.augment import augment_strong, augment_weak, get_augmentation
from raw2logit_tpu.evaluation.corruptions import (CORRUPTIONS, distort,
                                                  hsv_to_rgb, rgb_to_hsv)
from raw2logit_tpu.evaluation.metrics import ConfusionMetrics, over_n_runs
from raw2logit_tpu.losses import (accuracy, aux_loss, cross_entropy_loss,
                                  dice_loss, iou_score, l2_regularization,
                                  weighted_loss)


@pytest.fixture
def img_batch(rng):
    return jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))


def test_weak_augment_replays_on_mask(img_batch):
    mask = jnp.asarray((np.asarray(img_batch)[..., 0] > 0.5), jnp.float32)
    key = jax.random.key(7)
    out_img = augment_weak(key, img_batch)
    out_mask = augment_weak(key, mask, is_mask=True)
    # mask must undergo the identical geometric transform
    np.testing.assert_allclose(
        np.asarray(out_img[..., 0] > 0.5).astype(np.float32),
        np.asarray(out_mask), atol=0)


def test_weak_augment_is_geometric(img_batch):
    out = augment_weak(jax.random.key(3), img_batch)
    # pixel multiset is preserved by flips/rot90
    np.testing.assert_allclose(np.sort(np.asarray(out).ravel()),
                               np.sort(np.asarray(img_batch).ravel()),
                               atol=1e-7)


def test_strong_augment_mask_skips_photometric(img_batch):
    mask = jnp.asarray((np.asarray(img_batch)[..., 0] > 0.5), jnp.float32)
    key = jax.random.key(11)
    out_mask = augment_strong(key, mask, is_mask=True)
    # mask values stay binary (no noise / sharpness applied)
    vals = np.unique(np.asarray(out_mask))
    assert np.all((vals >= 0) & (vals <= 1))


def test_get_augmentation_none():
    assert get_augmentation("none") is None


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 3.0]])
    y = jnp.asarray([0, 1])
    want = -np.mean([np.log(np.exp(2) / (np.exp(2) + 1)),
                     np.log(np.exp(3) / (np.exp(3) + 1))])
    np.testing.assert_allclose(float(cross_entropy_loss(logits, y)), want,
                               rtol=1e-5)


def test_dice_loss_perfect_prediction():
    targets = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, size=(2, 16, 16)).astype(np.float32))
    logits = (targets * 2 - 1) * 20.0  # saturated sigmoid
    assert float(dice_loss(logits, targets)) < 1e-3


def test_weighted_loss_negates():
    base = lambda a, b: jnp.sum((a - b) ** 2)
    w = weighted_loss(base, -1.0)
    a, b = jnp.ones(3), jnp.zeros(3)
    assert float(w(a, b)) == -3.0


def test_aux_loss_l2_and_ssim(img_batch):
    fn = aux_loss("l2", weight=2.0)
    val = float(fn(img_batch, img_batch * 0.5))
    want = 2.0 * float(l2_regularization(img_batch, img_batch * 0.5))
    np.testing.assert_allclose(val, want, rtol=1e-6)
    fn = aux_loss("ssim", weight=1.0)
    assert float(fn(img_batch, img_batch)) > 0.999


def test_accuracy_and_iou():
    logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    y = jnp.asarray([0, 1, 1])
    np.testing.assert_allclose(float(accuracy(logits, y)), 2 / 3, rtol=1e-6)
    probs = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])[None]
    target = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])[None]
    np.testing.assert_allclose(float(iou_score(probs, target)), 0.5,
                               atol=1e-5)


def test_confusion_metrics():
    cm = ConfusionMetrics(2)
    cm.update([0, 0, 1, 1], [0, 1, 1, 1])
    assert cm.accuracy == 0.75
    s = cm.summary()
    assert set(s) == {"accuracy", "precision", "recall", "f1"}
    agg = over_n_runs([s, s])
    assert agg["accuracy_std"] == 0.0


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


@pytest.mark.parametrize("name", list(CORRUPTIONS))
def test_corruptions_bounded(name, rng):
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    for severity in (1, 5):
        out = distort(jax.random.key(0), x, name, severity)
        o = np.asarray(out)
        assert o.shape == x.shape
        assert np.all(o >= -1e-6) and np.all(o <= 1 + 1e-6), name
        assert np.all(np.isfinite(o))
    # identity is exact
    np.testing.assert_array_equal(
        np.asarray(distort(jax.random.key(0), x, "identity", 3)),
        np.asarray(x))


def test_corruption_severity_monotone_noise(rng):
    x = jnp.asarray(rng.uniform(0.3, 0.7, size=(2, 32, 32, 3))
                    .astype(np.float32))
    d1 = np.abs(np.asarray(distort(jax.random.key(0), x, "gaussian_noise", 1))
                - np.asarray(x)).mean()
    d5 = np.abs(np.asarray(distort(jax.random.key(0), x, "gaussian_noise", 5))
                - np.asarray(x)).mean()
    assert d5 > d1


def test_strong_augment_rotation_preserves_mask_alignment(img_batch):
    """Force the rotation branch and confirm image/mask stay aligned."""
    from raw2logit_tpu.augment import _rotate
    mask = jnp.asarray((np.asarray(img_batch)[..., 0] > 0.5), jnp.float32)
    img_r = _rotate(img_batch, 37.0)
    mask_r = _rotate(mask, 37.0)
    got = np.asarray(img_r[..., 0] > 0.5).astype(np.float32)
    want = np.asarray(mask_r)
    # nearest-neighbour rotation of a thresholded image == threshold of
    # rotated image
    np.testing.assert_allclose(got, want, atol=0)


def test_adjust_sharpness_bounds(img_batch):
    from raw2logit_tpu.augment import _adjust_sharpness
    out = np.asarray(_adjust_sharpness(img_batch, factor=0.5))
    assert out.shape == img_batch.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # border pixels keep original values (torchvision semantics)
    np.testing.assert_allclose(out[:, 0, :, :], np.asarray(img_batch)[:, 0],
                               atol=1e-6)


@pytest.mark.parametrize("name", ["defocus_blur", "pixelate",
                                  "jpeg_compression", "fog", "motion_blur",
                                  "glass_blur", "frost", "snow", "spatter"])
def test_extra_corruptions_bounded(name, rng):
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    out = np.asarray(distort(jax.random.key(1), x, name, 3))
    assert out.shape == x.shape
    assert np.all(out >= -1e-6) and np.all(out <= 1 + 1e-6)
    assert np.all(np.isfinite(out))
    assert np.abs(out - np.asarray(x)).mean() > 1e-4  # actually corrupts


def test_dice_loss_smp_joint_semantics():
    """smp DiceLoss(mode='binary') computes ONE dice over batch+spatial
    jointly and zeroes the loss for an empty-target batch."""
    from raw2logit_tpu.losses import dice_loss
    logits = jnp.asarray([[[8.0, -8.0], [-8.0, -8.0]],
                          [[-8.0, -8.0], [-8.0, -8.0]]])  # (2, 2, 2)
    y = jnp.asarray([[[1.0, 0.0], [0.0, 0.0]],
                     [[1.0, 1.0], [1.0, 1.0]]])
    # probs ~ [1,0,0,0 | 0,0,0,0]; I ~ 1, card ~ 1 + 5 -> dice ~ 2/6
    got = float(dice_loss(logits, y))
    p = np.asarray(jax.nn.sigmoid(logits)).ravel()
    t = np.asarray(y).ravel()
    want = 1.0 - 2.0 * (p * t).sum() / (p + t).sum()
    assert abs(got - want) < 1e-6

    # empty-target batch: zero loss, zero gradient (smp's mask)
    y0 = jnp.zeros_like(y)
    assert float(dice_loss(logits, y0)) == 0.0
    g = jax.grad(lambda l: dice_loss(l, y0))(logits)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
