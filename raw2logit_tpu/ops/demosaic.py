"""CFA demosaicing (RGGB pattern) in pure jnp.

Three algorithms with reference parity (pipeline_numpy.py:91-97):
  * bilinear    — textbook stencil interpolation
  * malvar2004  — Malvar, He, Cutler (ICASSP 2004) 5x5 linear kernels
  * menon2007   — Menon, Andriani, Calvagno (IEEE TIP 2007) DDFAPD
                  directional interpolation with decision + refining

plus ``debayer_mosaic_bilinear`` matching the torch path's conv debayer on a
scattered full-size mosaic (pipeline_torch.py:228-237, reflect padding).

All CFA inputs are (..., H, W); outputs are (..., H, W, 3).
The scipy.ndimage conventions of the reference are preserved:
mode='reflect' == symmetric padding for the 2-D convs of bilinear/malvar,
mode='mirror' == jnp 'reflect' padding for Menon's 1-D filters, and kernels
are flipped where true convolution of an asymmetric kernel is involved.
"""

import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.ops import constants
from raw2logit_tpu.ops.filters import conv2d_single
from raw2logit_tpu.ops.mosaic import bayer_masks


def debayer_mosaic_bilinear(mosaic, pad_mode="reflect"):
    """Bilinear debayer of a scattered (..., H, W, 3) mosaic via per-channel
    3x3 convs (K_RB, K_G, K_RB), torch-'reflect' padding by default.
    Equivalent to the reference Debayer module (pipeline_torch.py:228-237)."""
    r = conv2d_single(mosaic[..., 0], constants.K_RB, pad_mode=pad_mode)
    g = conv2d_single(mosaic[..., 1], constants.K_G, pad_mode=pad_mode)
    b = conv2d_single(mosaic[..., 2], constants.K_RB, pad_mode=pad_mode)
    return jnp.stack([r, g, b], axis=-1)


def demosaic_bilinear_cfa(cfa, pad_mode="symmetric"):
    """Bilinear demosaic of a (..., H, W) CFA. Matches
    colour_demosaicing.demosaicing_CFA_Bayer_bilinear: convolve the masked
    color planes with the averaging stencils, scipy default boundary
    (mode='reflect' == symmetric)."""
    h, w = cfa.shape[-2], cfa.shape[-1]
    r_m, g_m, b_m = bayer_masks(h, w, cfa.dtype)
    r = conv2d_single(cfa * r_m, constants.K_RB, pad_mode=pad_mode)
    g = conv2d_single(cfa * g_m, constants.K_G, pad_mode=pad_mode)
    b = conv2d_single(cfa * b_m, constants.K_RB, pad_mode=pad_mode)
    return jnp.stack([r, g, b], axis=-1)


# --- Malvar 2004 ---------------------------------------------------------
# High-quality linear interpolation kernels, published in
# "High-Quality Linear Interpolation for Demosaicing of Bayer-Patterned
# Color Images" (Malvar, He, Cutler; ICASSP 2004), eq. figures.

_GR_GB = np.array(
    [[0, 0, -1, 0, 0],
     [0, 0, 2, 0, 0],
     [-1, 2, 4, 2, -1],
     [0, 0, 2, 0, 0],
     [0, 0, -1, 0, 0]], dtype=np.float32) / 8.0

_Rg_RB_Bg_BR = np.array(
    [[0, 0, 0.5, 0, 0],
     [0, -1, 0, -1, 0],
     [-1, 4, 5, 4, -1],
     [0, -1, 0, -1, 0],
     [0, 0, 0.5, 0, 0]], dtype=np.float32) / 8.0

_Rg_BR_Bg_RB = _Rg_RB_Bg_BR.T

_Rb_BB_Br_RR = np.array(
    [[0, 0, -1.5, 0, 0],
     [0, 2, 0, 2, 0],
     [-1.5, 0, 6, 0, -1.5],
     [0, 2, 0, 2, 0],
     [0, 0, -1.5, 0, 0]], dtype=np.float32) / 8.0


def demosaic_malvar2004(cfa, pad_mode="symmetric"):
    """Malvar-He-Cutler 2004 demosaic of a (..., H, W) RGGB CFA."""
    h, w = cfa.shape[-2], cfa.shape[-1]
    r_m, g_m, b_m = bayer_masks(h, w, cfa.dtype)

    rows = jnp.arange(h) % 2
    cols = jnp.arange(w) % 2
    r_rows = (rows == 0).astype(cfa.dtype)[:, None]   # rows containing R
    r_cols = (cols == 0).astype(cfa.dtype)[None, :]   # cols containing R
    b_rows = 1.0 - r_rows
    b_cols = 1.0 - r_cols

    g = jnp.where(g_m == 1, cfa, conv2d_single(cfa, _GR_GB, pad_mode=pad_mode))

    rb_gr = conv2d_single(cfa, _Rg_RB_Bg_BR, pad_mode=pad_mode)  # horiz neighbours
    rb_gc = conv2d_single(cfa, _Rg_BR_Bg_RB, pad_mode=pad_mode)  # vert neighbours
    rb_diag = conv2d_single(cfa, _Rb_BB_Br_RR, pad_mode=pad_mode)

    r = cfa * r_m
    # G site in an R row / B column -> horizontal R neighbours:
    r = jnp.where((r_rows == 1) & (b_cols == 1), rb_gr, r)
    # G site in a B row / R column -> vertical R neighbours:
    r = jnp.where((b_rows == 1) & (r_cols == 1), rb_gc, r)
    # B site -> diagonal R neighbours:
    r = jnp.where(b_m == 1, rb_diag, r)

    b = cfa * b_m
    # G site in a B row / R column -> horizontal B neighbours:
    b = jnp.where((b_rows == 1) & (r_cols == 1), rb_gr, b)
    # G site in an R row / B column -> vertical B neighbours:
    b = jnp.where((r_rows == 1) & (b_cols == 1), rb_gc, b)
    # R site -> diagonal B neighbours:
    b = jnp.where(r_m == 1, rb_diag, b)

    return jnp.stack([r, g, b], axis=-1)


# --- Menon 2007 (DDFAPD) -------------------------------------------------

_H0 = np.array([0.0, 0.5, 0.0, 0.5, 0.0], dtype=np.float32)
_H1 = np.array([-0.25, 0.0, 0.5, 0.0, -0.25], dtype=np.float32)
_KB = np.array([0.5, 0.0, 0.5], dtype=np.float32)
_FIR = np.ones(3, dtype=np.float32) / 3.0

# Directional-gradient accumulation window (Menon 2007 eq. 9 neighbourhood).
# scipy convolve() flips the kernel; this is the pre-flipped (correlation)
# form of the causal window.
_K_DIR = np.array(
    [[1, 0, 1, 0, 0],
     [0, 1, 0, 0, 0],
     [3, 0, 3, 0, 0],
     [0, 1, 0, 0, 0],
     [1, 0, 1, 0, 0]], dtype=np.float32)


def _cnv_h(x, k1d):
    """Horizontal 1-D convolution, scipy mode='mirror' (jnp 'reflect')."""
    return conv2d_single(x, jnp.asarray(k1d)[None, :], pad_mode="reflect")


def _cnv_v(x, k1d):
    return conv2d_single(x, jnp.asarray(k1d)[:, None], pad_mode="reflect")


def _shift_right2(x, axis):
    """x[..., i+2] along axis, reflect-padded at the far edge (matches the
    reference's np.pad(..., (0, 2), mode='reflect') then slice [2:])."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 2)
    xp = jnp.pad(x, pad, mode="reflect")
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(2, 2 + x.shape[axis])
    return xp[tuple(idx)]


def demosaic_menon2007(cfa, refining_step=True):
    """Menon-Andriani-Calvagno 2007 (DDFAPD) demosaic of (..., H, W) RGGB.

    Directional (H/V) green interpolation, chrominance-gradient decision,
    color-difference-based R/B reconstruction, optional refining step."""
    h, w = cfa.shape[-2], cfa.shape[-1]
    r_m, g_m, b_m = bayer_masks(h, w, cfa.dtype)

    rows = (jnp.arange(h) % 2 == 0).astype(cfa.dtype)[:, None]
    cols = (jnp.arange(w) % 2 == 0).astype(cfa.dtype)[None, :]
    r_rows, r_cols = rows, cols            # R lives on even rows / cols
    b_rows, b_cols = 1.0 - rows, 1.0 - cols

    r0 = cfa * r_m
    g0 = cfa * g_m
    b0 = cfa * b_m

    # Directional green estimates (eq. 4-5): avg of neighbours + Laplacian.
    g_h = jnp.where(g_m == 0, _cnv_h(cfa, _H0) + _cnv_h(cfa, _H1), g0)
    g_v = jnp.where(g_m == 0, _cnv_v(cfa, _H0) + _cnv_v(cfa, _H1), g0)

    # Chrominances along each direction.
    c_h = jnp.where(r_m == 1, r0 - g_h, 0.0)
    c_h = jnp.where(b_m == 1, b0 - g_h, c_h)
    c_v = jnp.where(r_m == 1, r0 - g_v, 0.0)
    c_v = jnp.where(b_m == 1, b0 - g_v, c_v)

    # Directional gradients (eq. 8) and classifier sums (eq. 9).
    d_h = jnp.abs(c_h - _shift_right2(c_h, axis=-1))
    d_v = jnp.abs(c_v - _shift_right2(c_v, axis=-2))

    k_dir = jnp.asarray(_K_DIR, dtype=cfa.dtype)
    sum_h = conv2d_single(d_h, k_dir, pad_mode="zero")
    sum_v = conv2d_single(d_v, k_dir.T, pad_mode="zero")

    m = (sum_v >= sum_h)  # True -> horizontal wins
    g = jnp.where(m, g_h, g_v)

    # R and B at green sites via color-difference interpolation (eq. 13).
    r = r0
    r = jnp.where((g_m == 1) & (r_rows == 1),
                  g + _cnv_h(r0, _KB) - _cnv_h(g, _KB), r)
    r = jnp.where((g_m == 1) & (b_rows == 1),
                  g + _cnv_v(r0, _KB) - _cnv_v(g, _KB), r)
    b = b0
    b = jnp.where((g_m == 1) & (b_rows == 1),
                  g + _cnv_h(b0, _KB) - _cnv_h(g, _KB), b)
    b = jnp.where((g_m == 1) & (r_rows == 1),
                  g + _cnv_v(b0, _KB) - _cnv_v(g, _KB), b)

    # R at B sites and B at R sites, along the decided direction (eq. 14).
    r = jnp.where((b_rows == 1) & (b_m == 1),
                  jnp.where(m,
                            b + _cnv_h(r, _KB) - _cnv_h(b, _KB),
                            b + _cnv_v(r, _KB) - _cnv_v(b, _KB)), r)
    b = jnp.where((r_rows == 1) & (r_m == 1),
                  jnp.where(m,
                            r + _cnv_h(b, _KB) - _cnv_h(r, _KB),
                            r + _cnv_v(b, _KB) - _cnv_v(r, _KB)), b)

    if refining_step:
        r, g, b = _menon_refine(r, g, b, r_m, g_m, b_m,
                                r_rows, r_cols, b_rows, b_cols, m)

    return jnp.stack([r, g, b], axis=-1)


def _menon_refine(r, g, b, r_m, g_m, b_m, r_rows, r_cols, b_rows, b_cols, m):
    """Menon 2007 sec. V refining: lowpass the color differences and
    re-derive each plane from them at the sites it was interpolated."""
    # 1) refine G at R and B sites.
    r_g = r - g
    b_g = b - g
    b_g_m = jnp.where(b_m == 1,
                      jnp.where(m, _cnv_h(b_g, _FIR), _cnv_v(b_g, _FIR)), 0.0)
    r_g_m = jnp.where(r_m == 1,
                      jnp.where(m, _cnv_h(r_g, _FIR), _cnv_v(r_g, _FIR)), 0.0)
    g = jnp.where(r_m == 1, r - r_g_m, g)
    g = jnp.where(b_m == 1, b - b_g_m, g)

    # 2) refine R and B at green sites.
    r_g = r - g
    b_g = b - g
    r_g_m = jnp.where((g_m == 1) & (b_rows == 1), _cnv_v(r_g, _KB), r_g_m)
    r = jnp.where((g_m == 1) & (b_rows == 1), g + r_g_m, r)
    r_g_m = jnp.where((g_m == 1) & (b_cols == 1), _cnv_h(r_g, _KB), r_g_m)
    r = jnp.where((g_m == 1) & (b_cols == 1), g + r_g_m, r)

    b_g_m = jnp.where((g_m == 1) & (r_rows == 1), _cnv_v(b_g, _KB), b_g_m)
    b = jnp.where((g_m == 1) & (r_rows == 1), g + b_g_m, b)
    b_g_m = jnp.where((g_m == 1) & (r_cols == 1), _cnv_h(b_g, _KB), b_g_m)
    b = jnp.where((g_m == 1) & (r_cols == 1), g + b_g_m, b)

    # 3) refine R at B sites and B at R sites.
    r_g = r - g
    b_g = b - g
    r_g_m = jnp.where(b_m == 1,
                      jnp.where(m, _cnv_h(r_g, _KB), _cnv_v(r_g, _KB)), r_g_m)
    r = jnp.where(b_m == 1, g + r_g_m, r)
    b_g_m = jnp.where(r_m == 1,
                      jnp.where(m, _cnv_h(b_g, _KB), _cnv_v(b_g, _KB)), b_g_m)
    b = jnp.where(r_m == 1, g + b_g_m, b)

    return r, g, b


DEMOSAIC_FNS = {
    "bilinear": demosaic_bilinear_cfa,
    "malvar2004": demosaic_malvar2004,
    "menon2007": demosaic_menon2007,
}
