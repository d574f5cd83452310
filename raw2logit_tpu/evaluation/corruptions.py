"""Hendrycks & Dietterich common-corruptions battery (the 11 transforms the
reference's C-tables use, figures/ABtesting.py:635-636), in jnp with explicit
PRNG keys.

Constants match utils/hendrycks_robustness.py:141-427 exactly; randomness is
keyed instead of global. All functions take NHWC (B, H, W, 3) in [0, 1] and
a severity in 1..5. ``IMSIZE=32`` below reproduces the reference's behaviour
of keeping the CIFAR-scale elastic constants even on 256x256 tiles.
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.ops.filters import gaussian_filter_2d

IMSIZE = 32


def _per_channel_gaussian(x, sigma, pad_mode="edge"):
    """skimage.filters.gaussian(multichannel=True): per-channel filter,
    mode='nearest'."""
    planes = [gaussian_filter_2d(x[..., c], sigma, pad_mode=pad_mode)
              for c in range(x.shape[-1])]
    return jnp.stack(planes, axis=-1)


def identity(key, x, severity=1):
    del key, severity
    return x


def gaussian_noise(key, x, severity=1):
    c = [0.04, 0.06, 0.08, 0.09, 0.10][severity - 1]
    return jnp.clip(x + jax.random.normal(key, x.shape) * c, 0, 1)


def shot_noise(key, x, severity=1):
    c = [500, 250, 100, 75, 50][severity - 1]
    return jnp.clip(jax.random.poisson(key, x * c).astype(x.dtype) / c, 0, 1)


def impulse_noise(key, x, severity=1):
    """salt & pepper, amount c, half salt half pepper (skimage
    random_noise(mode='s&p'))."""
    c = [0.01, 0.02, 0.03, 0.05, 0.07][severity - 1]
    u = jax.random.uniform(key, x.shape)
    x = jnp.where(u < c / 2, 1.0, x)          # salt
    x = jnp.where(u > 1 - c / 2, 0.0, x)      # pepper
    return jnp.clip(x, 0, 1)


def speckle_noise(key, x, severity=1):
    c = [0.06, 0.1, 0.12, 0.16, 0.2][severity - 1]
    return jnp.clip(x + x * jax.random.normal(key, x.shape) * c, 0, 1)


def gaussian_blur(key, x, severity=1):
    del key
    c = [0.4, 0.6, 0.7, 0.8, 1.0][severity - 1]
    return jnp.clip(_per_channel_gaussian(x, c), 0, 1)


def _clipped_zoom(img, zoom_factor):
    """Center-crop + bilinear zoom back to size (hendrycks:123-133);
    per-image (H, W, C).

    The reference zooms with scipy.ndimage.zoom(order=1), whose
    coordinates are ENDPOINT-ALIGNED (output i -> i*(in-1)/(out-1)) —
    jax.image.resize's half-pixel-centre bilinear drifts up to ~0.018
    from it, so interpolate at scipy's coordinates explicitly."""
    h = img.shape[0]
    ch = int(np.ceil(h / zoom_factor))
    top = (h - ch) // 2
    crop = img[top:top + ch, top:top + ch]
    zh = int(round(ch * zoom_factor))
    scale = (ch - 1) / (zh - 1) if zh > 1 else 0.0
    coords = jnp.arange(zh, dtype=jnp.float32) * scale
    yy = jnp.broadcast_to(coords[:, None], (zh, zh))
    xx = jnp.broadcast_to(coords[None, :], (zh, zh))
    zoomed = jnp.stack(
        [jax.scipy.ndimage.map_coordinates(crop[..., c], [yy, xx], order=1)
         for c in range(img.shape[2])], axis=-1)
    trim = (zh - h) // 2
    return zoomed[trim:trim + h, trim:trim + h]


def zoom_blur(key, x, severity=1):
    del key
    factors = [np.arange(1, 1.06, 0.01), np.arange(1, 1.11, 0.01),
               np.arange(1, 1.16, 0.01), np.arange(1, 1.21, 0.01),
               np.arange(1, 1.26, 0.01)][severity - 1]

    def _one(img):
        out = jnp.zeros_like(img)
        for z in factors:
            out = out + _clipped_zoom(img, float(z))
        return (img + out) / (len(factors) + 1)

    return jnp.clip(jax.vmap(_one)(x), 0, 1)


def contrast(key, x, severity=1):
    del key
    c = [0.75, 0.5, 0.4, 0.3, 0.15][severity - 1]
    means = jnp.mean(x, axis=(1, 2), keepdims=True)
    return jnp.clip((x - means) * c + means, 0, 1)


def rgb_to_hsv(rgb):
    """skimage.color.rgb2hsv-compatible."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def brightness(key, x, severity=1):
    del key
    c = [0.05, 0.1, 0.15, 0.2, 0.3][severity - 1]
    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 2].set(jnp.clip(hsv[..., 2] + c, 0, 1))
    return jnp.clip(hsv_to_rgb(hsv), 0, 1)


def saturate(key, x, severity=1):
    del key
    c = [(0.3, 0.0), (0.1, 0.0), (1.5, 0.0), (2.0, 0.1), (2.5, 0.2)][severity - 1]
    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * c[0] + c[1], 0, 1))
    return jnp.clip(hsv_to_rgb(hsv), 0, 1)


def _affine_from_points(pts1, pts2):
    """Solve the 2x3 affine mapping pts1 -> pts2 (cv2.getAffineTransform)."""
    a = np.zeros((6, 6))
    b = np.zeros(6)
    for i in range(3):
        x, y = pts1[i]
        a[2 * i, :3] = [x, y, 1]
        a[2 * i + 1, 3:] = [x, y, 1]
        b[2 * i], b[2 * i + 1] = pts2[i]
    m = np.linalg.solve(a, b)
    return np.array([[m[0], m[1], m[2]], [m[3], m[4], m[5]]], np.float32)


def elastic_severity(severity, imsize=IMSIZE):
    """(displacement scale, smoothing sigma, affine jitter) — the reference
    keeps its IMSIZE=32 constants at any resolution (hendrycks:397-402)."""
    return [(imsize * 0.0, imsize * 0.0, imsize * 0.08),
            (imsize * 0.05, imsize * 0.2, imsize * 0.07),
            (imsize * 0.08, imsize * 0.06, imsize * 0.06),
            (imsize * 0.1, imsize * 0.04, imsize * 0.05),
            (imsize * 0.1, imsize * 0.03, imsize * 0.03)][severity - 1]


def elastic_control_points(h, w):
    """The affine control triangle (hendrycks:408-413)."""
    center = np.float32([h // 2, w // 2])
    square = min(h, w) // 3
    return np.float32([center + square,
                       [center[0] + square, center[1] - square],
                       center - square])


def _elastic_apply(x, jitter, dx_noise, dy_noise, c):
    """Deterministic elastic body, faithful to hendrycks:398-427 in two
    resampling stages:
      1. affine pull, bilinear, REFLECT_101 boundary (== scipy 'mirror'),
         matching cv2.warpAffine(..., borderMode=cv2.BORDER_REFLECT_101);
      2. gaussian-smoothed displacement field, order-1 map_coordinates with
         scipy mode='reflect' (edge-repeating 'symmetric').
    The randomness (affine jitter, raw noise fields) is injected so CPU
    goldens can drive both implementations with identical draws."""
    h, w = x.shape[1], x.shape[2]
    pts1 = elastic_control_points(h, w)
    # traced affine solve (jnp, not numpy): the jitter may be a tracer —
    # the jitted C-battery (abtesting._eval_fn) runs this under jit
    a = np.zeros((6, 6), np.float32)
    for i in range(3):
        a[2 * i, :3] = [pts1[i][0], pts1[i][1], 1.0]
        a[2 * i + 1, 3:] = [pts1[i][0], pts1[i][1], 1.0]
    pts2 = jnp.asarray(pts1) + jnp.asarray(jitter, jnp.float32)
    m = jnp.linalg.solve(jnp.asarray(a), pts2.reshape(-1)).reshape(2, 3)
    m3 = jnp.concatenate([m, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    minv = jnp.linalg.inv(m3)[:2]

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    src_x = minv[0, 0] * xx + minv[0, 1] * yy + minv[0, 2]
    src_y = minv[1, 0] * xx + minv[1, 1] * yy + minv[1, 2]

    if c[1] > 0:
        dx = gaussian_filter_2d(jnp.asarray(dx_noise, jnp.float32),
                                c[1], pad_mode="symmetric",
                                truncate=3.0) * c[0]
        dy = gaussian_filter_2d(jnp.asarray(dy_noise, jnp.float32),
                                c[1], pad_mode="symmetric",
                                truncate=3.0) * c[0]
    else:
        dx = jnp.asarray(dx_noise, jnp.float32) * c[0]
        dy = jnp.asarray(dy_noise, jnp.float32) * c[0]

    coord_y = yy + dy
    coord_x = xx + dx

    def _chan(plane):  # (H, W)
        affined = jax.scipy.ndimage.map_coordinates(
            plane, [src_y, src_x], order=1, mode="mirror")
        return jax.scipy.ndimage.map_coordinates(
            affined, [coord_y, coord_x], order=1, mode="reflect")

    def _one(img):  # (H, W, C)
        return jax.vmap(_chan, in_axes=-1, out_axes=-1)(img)

    return jnp.clip(jax.vmap(_one)(x), 0, 1)


def elastic_transform(key, x, severity=1, imsize=IMSIZE):
    """Random affine + gaussian-smoothed displacement field
    (hendrycks:398-427), explicit-PRNG batched."""
    c = elastic_severity(severity, imsize)
    h, w = x.shape[1], x.shape[2]
    k_aff, k_dx, k_dy = jax.random.split(key, 3)
    jitter = jax.random.uniform(k_aff, (3, 2), minval=-c[2], maxval=c[2])
    dx_noise = jax.random.uniform(k_dx, (h, w), minval=-1, maxval=1)
    dy_noise = jax.random.uniform(k_dy, (h, w), minval=-1, maxval=1)
    return _elastic_apply(x, jitter, dx_noise, dy_noise, c)


CORRUPTIONS: Dict[str, Callable] = {
    "identity": identity,
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "speckle_noise": speckle_noise,
    "gaussian_blur": gaussian_blur,
    "zoom_blur": zoom_blur,
    "contrast": contrast,
    "brightness": brightness,
    "saturate": saturate,
    "elastic_transform": elastic_transform,
}


def distort(key, x, transform="identity", severity=1):
    """Apply one corruption to an NHWC batch (Distortions.__call__,
    hendrycks:146-152, batched + keyed)."""
    return CORRUPTIONS[transform](key, x, severity)


# --- extras beyond the reference's 11-corruption battery -------------------
# The reference carries more Hendrycks transforms but they are unused,
# wand/cv2-bound, and hardcoded to CIFAR's 32px (hendrycks:192-427). The
# nine registered below are re-derived for arbitrary resolution and keyed
# PRNG. NOTE: only defocus_blur and pixelate are jit-safe; the rest
# (jpeg_compression: PIL, fog/frost/snow: numpy diamond-square fractal,
# motion_blur/glass_blur/spatter: host-side draws) must be called EAGERLY —
# none of them is in CORRUPTION_LIST (the jitted C-battery).

def _disk_kernel(radius, alias_blur=0.1):
    L = np.arange(-max(8, radius), max(8, radius) + 1)
    xx, yy = np.meshgrid(L, L)
    disk = ((xx ** 2 + yy ** 2) <= radius ** 2).astype(np.float32)
    disk /= disk.sum()
    imp = jnp.asarray(disk)
    return np.asarray(gaussian_filter_2d(imp, max(alias_blur, 1e-3),
                                         pad_mode="symmetric",
                                         truncate=1.0))


def defocus_blur(key, x, severity=1):
    """Disk-kernel blur (hendrycks:210-219 constants)."""
    del key
    radius, alias = [(0.3, 0.4), (0.4, 0.5), (0.5, 0.6), (1, 0.2),
                     (1.5, 0.1)][severity - 1]
    k = jnp.asarray(_disk_kernel(radius, alias))
    from raw2logit_tpu.ops.filters import conv2d_single
    planes = [conv2d_single(x[..., c], k, pad_mode="symmetric")
              for c in range(x.shape[-1])]
    return jnp.clip(jnp.stack(planes, axis=-1), 0, 1)


def pixelate(key, x, severity=1):
    """Box-downsample then upsample (hendrycks:388-394, scaled to the
    actual resolution instead of CIFAR's 32)."""
    del key
    c = [0.95, 0.9, 0.85, 0.75, 0.65][severity - 1]
    h, w = x.shape[1], x.shape[2]
    small = jax.image.resize(x, (x.shape[0], max(1, int(h * c)),
                                 max(1, int(w * c)), x.shape[3]),
                             method="linear")
    return jnp.clip(jax.image.resize(small, x.shape, method="nearest"), 0, 1)


def jpeg_compression(key, x, severity=1):
    """Actual JPEG round-trip via PIL (host-side, like the reference's
    PIL save/open, hendrycks:378-385)."""
    del key
    from io import BytesIO
    from PIL import Image as PILImage
    q = [80, 65, 58, 50, 40][severity - 1]
    out = []
    for img in np.asarray(jnp.clip(x, 0, 1)):
        buf = BytesIO()
        PILImage.fromarray((img * 255).astype(np.uint8)).save(
            buf, "JPEG", quality=q)
        out.append(np.asarray(PILImage.open(buf), np.float32) / 255.0)
    return jnp.asarray(np.stack(out))


def _plasma_fractal(key, mapsize, wibbledecay):
    """Diamond-square fractal heightmap (hendrycks:85-120), keyed."""
    maparray = np.zeros((mapsize, mapsize), np.float64)
    maparray[0, 0] = 0
    stepsize = mapsize
    wibble = 100.0
    rng = np.random.default_rng(np.asarray(
        jax.random.key_data(key)).ravel()[:2])

    def wibbledmean(array):
        # reference amplitude is wibble^2 (wibble * uniform(-wibble,
        # wibble), hendrycks:92) so fine-scale detail decays by
        # wibbledecay^2 per level
        return array / 4 + wibble * rng.uniform(-wibble, wibble,
                                                array.shape)

    while stepsize >= 2:
        # fill squares
        corner = maparray[0:mapsize:stepsize, 0:mapsize:stepsize]
        drsum = corner + np.roll(corner, -1, 0) + np.roll(corner, -1, 1) + \
            np.roll(np.roll(corner, -1, 0), -1, 1)
        maparray[stepsize // 2:mapsize:stepsize,
                 stepsize // 2:mapsize:stepsize] = wibbledmean(drsum)
        # fill diamonds
        drgrid = maparray[stepsize // 2:mapsize:stepsize,
                          stepsize // 2:mapsize:stepsize]
        ulgrid = maparray[0:mapsize:stepsize, 0:mapsize:stepsize]
        ltsum = drgrid + np.roll(drgrid, 1, 0) + ulgrid + \
            np.roll(ulgrid, -1, 1)
        maparray[0:mapsize:stepsize,
                 stepsize // 2:mapsize:stepsize] = wibbledmean(ltsum)
        ttsum = drgrid + np.roll(drgrid, 1, 1) + ulgrid + \
            np.roll(ulgrid, -1, 0)
        maparray[stepsize // 2:mapsize:stepsize,
                 0:mapsize:stepsize] = wibbledmean(ttsum)
        stepsize //= 2
        wibble /= wibbledecay
    maparray -= maparray.min()
    return maparray / maparray.max()


def fog(key, x, severity=1):
    """Plasma-fractal fog overlay (hendrycks:251-255 constants), fractal
    sized to the actual image."""
    c = [(0.2, 3), (0.5, 3), (0.75, 2.5), (1, 2), (1.5, 1.75)][severity - 1]
    h, w = x.shape[1], x.shape[2]
    mapsize = 1 << int(np.ceil(np.log2(max(h, w))))
    fract = _plasma_fractal(key, mapsize, c[1])[:h, :w]
    max_val = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    out = x + c[0] * jnp.asarray(fract, jnp.float32)[None, :, :, None]
    return jnp.clip(out * max_val / (max_val + c[0]), 0, 1)


def _luma(x):
    """Rec.601 luma (cv2.COLOR_RGB2GRAY weights)."""
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])


def _motion_blur_plane(plane, radius, sigma, angle_deg):
    """One-sided gaussian trail along ``angle_deg`` (the ImageMagick
    MotionBlur kernel: taps t=0..radius weighted exp(-t^2/2sigma^2),
    normalized; hendrycks:69-71,222-237), bilinear taps, mirror border."""
    h, w = plane.shape
    taps = np.arange(int(radius) + 1)
    weights = np.exp(-taps ** 2 / (2.0 * sigma ** 2))
    weights /= weights.sum()
    rad = angle_deg * np.pi / 180.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    acc = jnp.zeros_like(plane)
    for t, wt in zip(taps, weights):
        cy = yy + jnp.float32(np.sin(rad)) * t
        cx = xx + jnp.float32(np.cos(rad)) * t
        acc = acc + wt * jax.scipy.ndimage.map_coordinates(
            plane, [cy, cx], order=1, mode="mirror")
    return acc


def motion_blur(key, x, severity=1):
    """Directional blur at a random angle in (-45, 45)
    (hendrycks:222-237 constants; wand replaced by an explicit
    one-sided gaussian line kernel)."""
    radius, sigma = [(6, 1), (6, 1.5), (6, 2), (8, 2),
                     (9, 2.5)][severity - 1]
    angle = float(jax.random.uniform(key, (), minval=-45, maxval=45))

    def _one(img):
        return jax.vmap(lambda p: _motion_blur_plane(p, radius, sigma,
                                                     angle),
                        in_axes=-1, out_axes=-1)(img)

    return jnp.clip(jax.vmap(_one)(x), 0, 1)


def glass_blur(key, x, severity=1):
    """Gaussian blur + local random pixel displacement + gaussian
    (hendrycks:192-207). The reference swaps pixels sequentially over a
    32-grid; here every pixel gathers from a random neighbour within
    max_delta (the standard parallel re-derivation), any resolution."""
    sigma, max_delta, iters = [(0.05, 1, 1), (0.25, 1, 1), (0.4, 1, 1),
                               (0.25, 1, 2), (0.4, 1, 2)][severity - 1]
    h, w = x.shape[1], x.shape[2]
    out = _per_channel_gaussian(x, sigma)
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    for i in range(iters):
        key, k1, k2 = jax.random.split(key, 3)
        dy = jax.random.randint(k1, (h, w), -max_delta, max_delta + 1)
        dx = jax.random.randint(k2, (h, w), -max_delta, max_delta + 1)
        sy = jnp.clip(yy + dy, 0, h - 1)
        sx = jnp.clip(xx + dx, 0, w - 1)
        out = out[:, sy, sx, :]
    return jnp.clip(_per_channel_gaussian(out, sigma), 0, 1)


def frost(key, x, severity=1):
    """Frost overlay (hendrycks:258-268 blend constants). The reference
    blends randomly-cropped bundled texture photos (frost1.png...); this
    build ships no image assets, so the texture is procedural: a sharpened
    plasma fractal tinted icy blue-white. Host-side (like fog)."""
    c = [(1, 0.2), (1, 0.3), (0.9, 0.4), (0.85, 0.4),
         (0.75, 0.45)][severity - 1]
    h, w = x.shape[1], x.shape[2]
    mapsize = 1 << int(np.ceil(np.log2(max(h, w))))
    k_tex, _ = jax.random.split(key)
    fract = _plasma_fractal(k_tex, mapsize, 2.0)[:h, :w]
    crystals = np.clip((fract - 0.6) / 0.4, 0, 1) ** 0.5
    tex = np.stack([0.85 * crystals, 0.92 * crystals, 1.0 * crystals],
                   axis=-1)
    return jnp.clip(c[0] * x + c[1] * jnp.asarray(tex, jnp.float32)[None],
                    0, 1)


def snow(key, x, severity=1):
    """Snow layer: thresholded zoomed gaussian noise, motion-blurred along
    a random angle in (-135, -45), added plus its 180-degree rotation over
    a contrast-lifted image (hendrycks:271-295)."""
    c = [(0.1, 0.2, 1, 0.6, 8, 3, 0.95),
         (0.1, 0.2, 1, 0.5, 10, 4, 0.9),
         (0.15, 0.3, 1.75, 0.55, 10, 4, 0.9),
         (0.25, 0.3, 2.25, 0.6, 12, 6, 0.85),
         (0.3, 0.3, 1.25, 0.65, 14, 12, 0.8)][severity - 1]
    h, w = x.shape[1], x.shape[2]
    k_layer, k_angle = jax.random.split(key)
    layer = c[0] + c[1] * jax.random.normal(k_layer, (h, w))
    layer = _clipped_zoom(layer[..., None], c[2])[..., 0]
    layer = jnp.where(layer < c[3], 0.0, layer)
    layer = jnp.clip(layer, 0, 1)
    angle = float(jax.random.uniform(k_angle, (), minval=-135, maxval=-45))
    layer = _motion_blur_plane(layer, c[4], c[5], angle)

    gray = _luma(x)[..., None] * 1.5 + 0.5
    lifted = c[6] * x + (1 - c[6]) * jnp.maximum(x, gray)
    snow_both = layer[None, :, :, None] + jnp.rot90(
        layer, k=2)[None, :, :, None]
    return jnp.clip(lifted + snow_both, 0, 1)


def _sobel_mag(plane):
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    from raw2logit_tpu.ops.filters import conv2d_single
    gx = conv2d_single(plane, kx, pad_mode="symmetric")
    gy = conv2d_single(plane, kx.T, pad_mode="symmetric")
    return jnp.sqrt(gx * gx + gy * gy + 1e-12)


def spatter(key, x, severity=1):
    """Liquid spatter (hendrycks:298-349 constants). Mud branch is exact;
    the water branch's Canny + distance-transform + equalizeHist chain is
    re-derived as gradient-magnitude weighting of the liquid layer (same
    droplet-edge emphasis, no cv2 in the graph)."""
    c = [(0.62, 0.1, 0.7, 0.7, 0.5, 0),
         (0.65, 0.1, 0.8, 0.7, 0.5, 0),
         (0.65, 0.3, 1, 0.69, 0.5, 0),
         (0.65, 0.1, 0.7, 0.69, 0.6, 1),
         (0.65, 0.1, 0.5, 0.68, 0.6, 1)][severity - 1]
    h, w = x.shape[1], x.shape[2]
    liquid = c[0] + c[1] * jax.random.normal(key, (h, w))
    liquid = gaussian_filter_2d(liquid, c[2], pad_mode="symmetric")

    if c[5] == 0:  # water: pale-turquoise film weighted by droplet edges
        liquid = jnp.where(liquid < c[3], 0.0, liquid)
        m = liquid * _sobel_mag(liquid)
        m = m / (jnp.max(m) + 1e-12) * c[4]
        color = jnp.asarray([175 / 255.0, 238 / 255.0, 238 / 255.0],
                            jnp.float32)
        return jnp.clip(x + m[None, :, :, None] * color, 0, 1)

    # mud: hard mask, smoothed, brown overlay
    m = jnp.where(liquid > c[3], 1.0, 0.0)
    m = gaussian_filter_2d(m, c[4], pad_mode="symmetric")
    m = jnp.where(m < 0.8, 0.0, m)
    color = jnp.asarray([63 / 255.0, 42 / 255.0, 20 / 255.0], jnp.float32)
    return jnp.clip(x * (1 - m[None, :, :, None])
                    + m[None, :, :, None] * color, 0, 1)


CORRUPTIONS.update({
    "defocus_blur": defocus_blur,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
    "fog": fog,
    "motion_blur": motion_blur,
    "glass_blur": glass_blur,
    "frost": frost,
    "snow": snow,
    "spatter": spatter,
})
