"""Extended denoisers: TV-Chambolle, TV-Bregman (split Bregman), bilateral.

The reference's ``processing`` exposes these via skimage.restoration
(pipeline_numpy.py:124-135); they are not reachable from the training CLI
(train.py:100-101 only offers gaussian/median/fft) but are part of the
static-pipeline API surface. Implemented here from the published algorithms
(Chambolle 2004 dual projection as in skimage's ND variant; Goldstein-Osher
split Bregman; windowed gaussian bilateral), jit-compatible via lax loops.

All functions take (..., H, W, C) float images (multichannel applied
per channel, matching skimage multichannel=True).
"""

import jax
import jax.numpy as jnp


def _grad2d(x):
    """Forward differences along H and W (zero at the far edge)."""
    gh = jnp.zeros_like(x).at[..., :-1, :].set(x[..., 1:, :] - x[..., :-1, :])
    gw = jnp.zeros_like(x).at[..., :, :-1].set(x[..., :, 1:] - x[..., :, :-1])
    return gh, gw


def _div2d(ph, pw):
    """Adjoint (negative divergence) of _grad2d."""
    dh = jnp.zeros_like(ph)
    dh = dh.at[..., 0, :].set(ph[..., 0, :])
    dh = dh.at[..., 1:-1, :].set(ph[..., 1:-1, :] - ph[..., :-2, :])
    dh = dh.at[..., -1, :].set(-ph[..., -2, :])
    dw = jnp.zeros_like(pw)
    dw = dw.at[..., :, 0].set(pw[..., :, 0])
    dw = dw.at[..., :, 1:-1].set(pw[..., :, 1:-1] - pw[..., :, :-2])
    dw = dw.at[..., :, -1].set(-pw[..., :, -2])
    return dh + dw


def _tv_chambolle_plane(img, weight, n_iter_max):
    """Chambolle 2004 dual projection on one (..., H, W) plane, fixed
    iteration count (the data-dependent energy stop of skimage is replaced
    by the max-iteration bound for jit compatibility)."""
    tau = 0.25  # 1 / (2 * ndim), ndim = 2

    def body(_, state):
        ph, pw = state
        out = img - _div2d(ph, pw)  # u = f + d, d = -div p (skimage sign)
        gh, gw = _grad2d(out)
        norm = jnp.sqrt(gh ** 2 + gw ** 2)
        denom = 1.0 + (tau / weight) * norm
        ph = (ph - tau * gh) / denom
        pw = (pw - tau * gw) / denom
        return ph, pw

    ph = jnp.zeros_like(img)
    pw = jnp.zeros_like(img)
    ph, pw = jax.lax.fori_loop(0, n_iter_max, body, (ph, pw))
    return img - _div2d(ph, pw)


def denoise_tv_chambolle(img, weight=0.01, n_iter_max=200):
    """Per-channel TV denoise (skimage multichannel=True semantics;
    pipeline_numpy.py:125-126: lower weight -> less denoising)."""
    planes = [_tv_chambolle_plane(img[..., c], weight, n_iter_max)
              for c in range(img.shape[-1])]
    return jnp.stack(planes, axis=-1)


def _shrink(x, lam):
    mag = jnp.sqrt(jnp.sum(x ** 2, axis=0, keepdims=True))
    factor = jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-12)
    return x * factor


def denoise_tv_bregman(img, weight=100.0, max_iter=100, isotropic=True,
                       mu=None):
    """Isotropic TV via split Bregman (Goldstein & Osher 2009).

    skimage semantics (pipeline_numpy.py:127-129): LOWER weight -> MORE
    denoising (weight multiplies the data-fidelity term)."""
    lam = 2.0 * weight  # skimage: lambda = 2 * weight

    def plane(u0):
        dh = jnp.zeros((2,) + u0.shape)
        b = jnp.zeros_like(dh)

        def body(_, state):
            u, d, b = state
            # u-subproblem: one Jacobi sweep of
            # (lam - gamma*Laplacian) u = lam*u0 - gamma*div(d - b)
            # (grad^T = -div for the forward-difference pair above)
            gamma = 2.0
            rhs = lam * u0 - gamma * _div2d(d[0] - b[0], d[1] - b[1])
            # edge-clamped neighbour sum (jnp.roll would impose PERIODIC
            # boundaries, coupling opposite image edges — skimage and the
            # Goldstein-Osher scheme are non-periodic)
            up = jnp.pad(u, ((1, 1), (1, 1)), mode="edge")
            lap_nb = (up[:-2, 1:-1] + up[2:, 1:-1]
                      + up[1:-1, :-2] + up[1:-1, 2:])
            u = (rhs + gamma * lap_nb) / (lam + 4.0 * gamma)
            gh, gw = _grad2d(u)
            g = jnp.stack([gh, gw])
            if isotropic:
                d = _shrink(g + b, 1.0 / gamma)
            else:
                d = jnp.sign(g + b) * jnp.maximum(
                    jnp.abs(g + b) - 1.0 / gamma, 0.0)
            b = b + g - d
            return u, d, b

        u, _, _ = jax.lax.fori_loop(0, max_iter, body, (u0, dh, b))
        return u

    planes = [plane(img[..., c]) for c in range(img.shape[-1])]
    return jnp.stack(planes, axis=-1)


def denoise_bilateral(img, sigma_color=None, sigma_spatial=0.6,
                      win_size=None):
    """Windowed gaussian bilateral filter (skimage.restoration
    .denoise_bilateral semantics: win_size = 2*ceil(3*sigma_spatial)+1,
    sigma_color defaults to the image std; multichannel=True computes ONE
    range weight per neighbour from the colour distance summed over
    channels, applied to all channels)."""
    if win_size is None:
        win_size = max(5, 2 * int(jnp.ceil(3 * sigma_spatial)) + 1)
    r = win_size // 2
    if sigma_color is None:
        sigma_color = jnp.std(img)

    pad = [(0, 0)] * (img.ndim - 3) + [(r, r), (r, r), (0, 0)]
    xp = jnp.pad(img, pad, mode="constant")
    h, w = img.shape[-3], img.shape[-2]

    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = xp[..., r + dy:r + dy + h, r + dx:r + dx + w, :]
            sw = jnp.exp(-(dy * dy + dx * dx) /
                         (2.0 * sigma_spatial ** 2))
            # joint colour distance across channels -> one weight per
            # neighbour (skimage multichannel semantics)
            cw = jnp.exp(-jnp.sum((shifted - img) ** 2, axis=-1,
                                  keepdims=True) /
                         (2.0 * sigma_color ** 2))
            wgt = sw * cw
            num = num + wgt * shifted
            den = den + wgt
    return num / jnp.maximum(den, 1e-12)
