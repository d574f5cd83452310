"""Batched augmentations with explicit PRNG keys and image/mask replay.

Re-design of the reference's ComposeState (utils/augmentation.py:39-67),
which replays transforms on segmentation masks by RESEEDING THE GLOBAL RNG —
unsafe under multiprocess loaders. Here, the same jax.random key produces the
same geometric draws for image and mask; photometric transforms
(noise, sharpness) are skipped for masks, mirroring the reference's
``(transform, apply_for_mask=False)`` tuples (utils/augmentation.py:77-84).

Like the reference (transforms applied to the full batch tensor inside
LitModel.forward, model.py:79-81), random draws are per-batch.

Conventions: input is (B, H, W, C) or (B, H, W); H is axis 1, W is axis 2.
"""

import jax
import jax.numpy as jnp


def _hflip(x):
    return jnp.flip(x, axis=2)


def _vflip(x):
    return jnp.flip(x, axis=1)


def _rot90(x, k):
    """Rotate in the (W, H) plane — matches x.rot90(k, dims=(-1, -2)) on
    NCHW in the reference (utils/augmentation.py:8-14)."""
    return jax.lax.switch(
        k,
        [lambda v: v,
         lambda v: jnp.rot90(v, 1, axes=(2, 1)),
         lambda v: jnp.rot90(v, 2, axes=(2, 1)),
         lambda v: jnp.rot90(v, 3, axes=(2, 1))],
        x)


def _rotate(x, angle_deg, order=0):
    """Rotate the whole batch by angle (degrees) about the image center,
    nearest-neighbour (torchvision RandomRotation default), zero fill."""
    h, w = x.shape[1], x.shape[2]
    theta = -angle_deg * jnp.pi / 180.0  # inverse map
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    yc, xc = yy - cy, xx - cx
    src_y = jnp.cos(theta) * yc - jnp.sin(theta) * xc + cy
    src_x = jnp.sin(theta) * yc + jnp.cos(theta) * xc + cx

    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]

    def _one(img):  # (H, W, C)
        def _chan(c):  # (H, W)
            return jax.scipy.ndimage.map_coordinates(
                c, [src_y, src_x], order=order, mode="constant", cval=0.0)
        return jax.vmap(_chan, in_axes=-1, out_axes=-1)(img)

    out = jax.vmap(_one)(x)
    return out[..., 0] if squeeze else out


def _add_gaussian_noise(key, x, std=0.0005):
    return x + jax.random.normal(key, x.shape, x.dtype) * std


def _adjust_sharpness(x, factor=0.5):
    """torchvision RandomAdjustSharpness semantics: blend the image with a
    fixed-blur version (kernel [[1,1,1],[1,5,1],[1,1,1]]/13, border pixels
    kept from the original), then clamp to [0, 1]."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]],
                  dtype=x.dtype) / 13.0
    c = x.shape[-1]
    kern = k[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    blurred = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    # keep original border pixels (torchvision applies the valid-region blur)
    mask = jnp.zeros(x.shape[1:3], x.dtype).at[1:-1, 1:-1].set(1.0)
    blurred = blurred * mask[..., None] + x * (1.0 - mask[..., None])
    out = jnp.clip(factor * x + (1.0 - factor) * blurred, 0.0, 1.0)
    return out[..., 0] if squeeze else out


def augment_weak(key, x, is_mask=False):
    """HFlip(.5) -> VFlip(.5) -> Rot90(k~U{0..3}) — all geometric, so masks
    get the identical treatment (utils/augmentation.py:70-74)."""
    del is_mask  # all transforms are geometric
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.where(jax.random.bernoulli(k1), _hflip(x), x)
    x = jnp.where(jax.random.bernoulli(k2), _vflip(x), x)
    x = _rot90(x, jax.random.randint(k3, (), 0, 4))
    return x


def augment_strong(key, x, is_mask=False):
    """HFlip(.5) -> VFlip(.5) -> maybe Rotate(U(-90,90)) ->
    [image only] maybe GaussianNoise(5e-4) -> maybe AdjustSharpness(0.5)
    (utils/augmentation.py:77-84)."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    x = jnp.where(jax.random.bernoulli(k1), _hflip(x), x)
    x = jnp.where(jax.random.bernoulli(k2), _vflip(x), x)
    angle = jax.random.uniform(k4, (), minval=-90.0, maxval=90.0)
    x = jnp.where(jax.random.bernoulli(k3), _rotate(x, angle), x)
    if not is_mask:
        x = jnp.where(jax.random.bernoulli(k5),
                      _add_gaussian_noise(k6, x), x)
        x = jnp.where(jax.random.bernoulli(k7), _adjust_sharpness(x), x)
    return x


AUGMENTATIONS = {"none": None, "weak": augment_weak, "strong": augment_strong}


def get_augmentation(kind):
    """Mirrors get_augmentation (utils/augmentation.py:87-93); returns a
    function (key, x, is_mask=False) -> x, or None."""
    return AUGMENTATIONS[kind]
