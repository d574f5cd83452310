"""Fused Pallas kernels for the adversarial SSIM aux regularizer.

The drift-forensics aux loss is ``weight * SSIM(ref_rgb, adv_rgb)``
(reference utils/base.py:346-358 + utils/ssim.py:19-39) and its gradient
w.r.t. the adversarial processor's RGB output. As XLA programs the six
separable gaussian-window convs (plus their vjps) each round-trip a full
activation through HBM — measured 28.6 ms at batch 256 with 77% HBM
utilization (results/profile_step_adv.json). Fusing the whole
value-and-grad into two per-(image, channel) kernels reduces the HBM
traffic to the irreducible reads/writes: fwd reads the two images and
writes five blurred-field residual planes per channel plus a per-image
row of column sums; bwd reads images+residuals and writes d(adv_rgb).

Math identical to ops/ssim.py (separable 11-tap gaussian, zero 'same'
padding, C1=0.01^2, C2=0.03^2), on PLANAR (B, 3, H, W) tensors — the
staged fast path's native layout, so the NHWC boundary transposes
disappear too.

Backward derivation (only d/d img2 is needed; the reference processor is
frozen): with per-pixel fields mu1=blur(x), mu2=blur(y), B11=blur(x^2),
B22=blur(y^2), B12=blur(xy) and
    A1 = 2 mu1 mu2 + C1        D1 = mu1^2 + mu2^2 + C1
    A2 = 2 (B12 - mu1 mu2) + C2  D2 = (B11 - mu1^2) + (B22 - mu2^2) + C2
    m  = A1 A2 / (D1 D2),
the chain rule through the three y-dependent fields gives
    dL/dy = s * [ blur(dm/dmu2) + 2 y blur(dm/dB22) + x blur(dm/dB12) ]
    dm/dmu2 = (2 mu1 (A2 - A1) - m * 2 mu2 (D2 - D1)) / (D1 D2)
    dm/dB22 = -m / D2
    dm/dB12 = 2 A1 / (D1 D2)
(the symmetric zero-padded blur is self-adjoint), with s the mean/weight
scale. Verified against jax.grad of ops/ssim.py (tests/test_pallas.py).

Kernel-shape rules followed (ROUND3_NOTES): concatenate pads only touch
offset-0 operands (fresh loads / elementwise results), reductions run
along sublanes in-kernel leaving lanes+batch to XLA, program outputs are
planar. The grid is (batch, channel) — a whole-image block (2 inputs +
15 residual planes + blur temps live at once) measured 22.4 MB of scoped
VMEM stack against the backend's 16 MB limit; per-channel blocks fit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2logit_tpu.ops.ssim import _gauss_np

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2
_WIN = 11
_R = _WIN // 2


def _blur_zero(x, g_ref):
    """Separable 11-tap gaussian with zero 'same' padding on an (H, W)
    plane; ``g_ref`` is a (1, 11) SMEM ref. Both concatenate pads see
    offset-0 operands (x is a fresh load or an elementwise/stencil
    RESULT, never a raw stencil slice)."""
    h, w = x.shape
    zr = jnp.zeros((_R, w), x.dtype)
    xp = jnp.concatenate([zr, x, zr], axis=0)
    acc = None
    for k in range(_WIN):
        tap = xp[k:k + h, :] * g_ref[0, k]
        acc = tap if acc is None else acc + tap
    zc = jnp.zeros((h, _R), acc.dtype)
    xp = jnp.concatenate([zc, acc, zc], axis=1)
    acc = None
    for k in range(_WIN):
        tap = xp[:, k:k + w] * g_ref[0, k]
        acc = tap if acc is None else acc + tap
    return acc


def _map_terms(mu1, mu2, b11, b22, b12):
    a1 = 2.0 * mu1 * mu2 + _C1
    a2 = 2.0 * (b12 - mu1 * mu2) + _C2
    d1 = mu1 * mu1 + mu2 * mu2 + _C1
    d2 = (b11 - mu1 * mu1) + (b22 - mu2 * mu2) + _C2
    return a1, a2, d1, d2


def _ssim_aux_fused_kernel(img1_ref, img2_ref, g_ref, scale_ref,
                           rows_ref, dimg2_ref, f_ref):
    """Value AND gradient in one pass: aux_grad always needs both, so the
    two-kernel split's residual round-trip (15 planes written + re-read,
    ~2.4 GB at batch 256) is pure overhead. The five blurred fields live
    in a VMEM scratch (f_ref), reloaded per use to stay inside the 16 MB
    scoped-VMEM stack."""
    s = scale_ref[0, 0]
    f_ref[0] = _blur_zero(img1_ref[0, 0], g_ref)
    f_ref[1] = _blur_zero(img2_ref[0, 0], g_ref)
    f_ref[2] = _blur_zero(img1_ref[0, 0] * img1_ref[0, 0], g_ref)
    f_ref[3] = _blur_zero(img2_ref[0, 0] * img2_ref[0, 0], g_ref)
    f_ref[4] = _blur_zero(img1_ref[0, 0] * img2_ref[0, 0], g_ref)

    def terms():
        return _map_terms(f_ref[0], f_ref[1], f_ref[2], f_ref[3], f_ref[4])

    a1, a2, d1, d2 = terms()
    m = (a1 * a2) / (d1 * d2)
    row = jnp.sum(m, axis=0, keepdims=True)  # sublane reduction

    @pl.when(pl.program_id(1) == 0)
    def _init():
        rows_ref[0] = jnp.zeros_like(row)

    rows_ref[0] += row

    a1, a2, d1, d2 = terms()
    den = d1 * d2
    m = (a1 * a2) / den
    d_mu2 = (2.0 * f_ref[0] * (a2 - a1)
             - m * 2.0 * f_ref[1] * (d2 - d1)) / den
    dimg2_ref[0, 0] = s * _blur_zero(d_mu2, g_ref)

    a1, a2, d1, d2 = terms()
    d_b22 = -(a1 * a2) / (d1 * d2) / d2
    dimg2_ref[0, 0] += (2.0 * s) * img2_ref[0, 0] * _blur_zero(d_b22, g_ref)

    a1, _, d1, d2 = terms()
    d_b12 = 2.0 * a1 / (d1 * d2)
    dimg2_ref[0, 0] += s * img1_ref[0, 0] * _blur_zero(d_b12, g_ref)


@functools.lru_cache(maxsize=None)
def _g_row():
    return np.asarray(_gauss_np(_WIN), np.float32)[None, :]


def ssim_aux_value_grad(ref_planar, x_planar, weight, interpret=False):
    """(weight * SSIM(ref, x), d/dx of it) over PLANAR (B, 3, H, W) f32
    batches, fused into ONE Pallas program (a (batch, channel) grid)."""
    b, c, h, w = x_planar.shape
    assert c == 3, x_planar.shape
    g = jnp.asarray(_g_row())
    n = b * c * h * w
    scale = jnp.full((1, 1), weight / n, jnp.float32)
    smem = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.SMEM)
    img_spec = pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    rows, d_x = pl.pallas_call(
        _ssim_aux_fused_kernel,
        grid=(b, c),
        in_specs=[img_spec, img_spec, smem((1, _WIN)), smem((1, 1))],
        out_specs=(
            pl.BlockSpec((1, 1, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((5, h, w), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * 3 * (8 * _WIN * 4 + 70),
            bytes_accessed=b * h * w * 4 * (6 + 3),
            transcendentals=0,
        ),
    )(ref_planar, x_planar, g, scale)
    value = weight * jnp.sum(rows) / n
    return value, d_x
