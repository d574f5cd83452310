"""Fused raw->RGB ISP as one Pallas TPU kernel with custom VJP.

Fuses the whole differentiable pipeline (pipeline_torch.py:175-225 span;
see SURVEY.md §3.2) for one image per grid step:

  black-level pack -> learnable 3x3 debayer conv (reflect pad) ->
  WB * CCM * RGB->YUV (one combined 3x3 pointwise matrix) ->
  sharpen Y (3x3, zero pad) -> blur Y (5x5, reflect pad) ->
  YUV->RGB -> clip(1e-5, 1) -> exp(log(x)/gamma)

Everything is VPU work on VMEM-resident (H, W) planes — a single HBM read
of the raw mosaic and a single write of the planar RGB output, instead of
one round-trip per stage. Layout is PLANAR (B, 3, H, W) inside the kernel
(W on the 128-lane axis); the public wrapper returns NHWC to match the rest
of the framework.

Backward: custom VJP that differentiates the numerically-identical jnp
composition (the staged path is the truth source; forward parity is tested
to 1e-5). A hand-written backward kernel is a later optimization.
"""

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2logit_tpu.ops import constants


# --- in-kernel helpers (operate on (H, W) jnp values) ----------------------

def _pad1_reflect(x):
    """1-px torch-'reflect' pad: row/col -1 mirrors row/col 1."""
    top, bot = x[1:2, :], x[-2:-1, :]
    x = jnp.concatenate([top, x, bot], axis=0)
    left, right = x[:, 1:2], x[:, -2:-1]
    return jnp.concatenate([left, x, right], axis=1)


def _pad2_reflect(x):
    """2-px reflect pad (rows -1,-2 mirror rows 1,2)."""
    top = jnp.concatenate([x[2:3, :], x[1:2, :]], axis=0)
    bot = jnp.concatenate([x[-2:-1, :], x[-3:-2, :]], axis=0)
    x = jnp.concatenate([top, x, bot], axis=0)
    left = jnp.concatenate([x[:, 2:3], x[:, 1:2]], axis=1)
    right = jnp.concatenate([x[:, -2:-1], x[:, -3:-2]], axis=1)
    return jnp.concatenate([left, x, right], axis=1)


def _pad1_zero(x):
    h, w = x.shape
    z_row = jnp.zeros((1, w), x.dtype)
    x = jnp.concatenate([z_row, x, z_row], axis=0)
    z_col = jnp.zeros((h + 2, 1), x.dtype)
    return jnp.concatenate([z_col, x, z_col], axis=1)


def _stencil(xp, k_ref, ksize, h, w, base=(0, 0)):
    """Unrolled shifted-multiply-add: sum_t k[t] * xp[shifted]. ``k_ref`` is
    an SMEM ref indexed with static ints; xp is the padded plane."""
    acc = None
    for i in range(ksize):
        for j in range(ksize):
            tap = xp[i:i + h, j:j + w] * k_ref[base[0] + i, base[1] + j]
            acc = tap if acc is None else acc + tap
    return acc


def _isp_compute(raw, bl_ref, kdeb_ref, a_ref, minv_ref, ksharp_ref,
                 kblur_ref, gamma_ref):
    """Shared ISP math on one (H, W) mosaic; returns the three output
    channel planes plus the intermediates the backward kernel wants as
    residuals (deb planes, sharpened luma s, blurred luma t)."""
    h, w = raw.shape

    # parity masks for the RGGB lattice
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2
    even_r = rows == 0
    even_c = cols == 0

    # black-level pack + debayer in one pass. The scattered planes are
    # 2/3 structural zeros, so instead of 3 padded planes x 81 taps, pad
    # the mosaic ONCE and give each tap a site-class-selected
    # coefficient: deb_co(p) = sum_t xp_t(p) * K[t, ch(p+t-1), co],
    # where ch is the RGGB channel of the tap's source site (torch-
    # 'reflect' maps index -1 -> 1 and n -> n-2, both parity-preserving,
    # so the padded lattice keeps the plain parity pattern). 108 plane-
    # ops instead of 162 + two fewer concatenate pads.
    bl_map = jnp.where(
        even_r,
        jnp.where(even_c, bl_ref[0, 0], bl_ref[0, 1]),
        jnp.where(even_c, bl_ref[0, 2], bl_ref[0, 3]))
    x = raw - bl_map
    xp = _pad1_reflect(x)
    deb = [None, None, None]
    for i in range(3):
        # source-site row parity for tap row offset i-1
        re = even_r if i == 1 else ~even_r
        for j in range(3):
            ce = even_c if j == 1 else ~even_c
            xt = xp[i:i + h, j:j + w]
            t = i * 3 + j
            for co in range(3):
                coef = jnp.where(
                    re & ce, kdeb_ref[t, 0 * 3 + co],
                    jnp.where(~re & ~ce, kdeb_ref[t, 2 * 3 + co],
                              kdeb_ref[t, 1 * 3 + co]))
                tap = xt * coef
                deb[co] = tap if deb[co] is None else deb[co] + tap

    # combined WB*CCM*RGB2YUV pointwise 3x3
    yuv = [a_ref[k, 0] * deb[0] + a_ref[k, 1] * deb[1] + a_ref[k, 2] * deb[2]
           for k in range(3)]

    # sharpen Y: 3x3, zero pad
    s = _stencil(_pad1_zero(yuv[0]), ksharp_ref, 3, h, w)
    # blur Y: 5x5, reflect pad
    t_lum = _stencil(_pad2_reflect(s), kblur_ref, 5, h, w)
    yuv[0] = t_lum

    # YUV->RGB, clip, gamma
    inv_g = 1.0 / gamma_ref[0, 0]
    outs = []
    for c in range(3):
        v = (minv_ref[c, 0] * yuv[0] + minv_ref[c, 1] * yuv[1]
             + minv_ref[c, 2] * yuv[2])
        v = jnp.clip(v, 1e-5, 1.0)
        outs.append(jnp.exp(jnp.log(v) * inv_g))
    return outs, deb, s, t_lum


def _isp_kernel(raw_ref, bl_ref, kdeb_ref, a_ref, minv_ref, ksharp_ref,
                kblur_ref, gamma_ref, out_ref):
    outs, _, _, _ = _isp_compute(raw_ref[0], bl_ref, kdeb_ref, a_ref,
                                 minv_ref, ksharp_ref, kblur_ref, gamma_ref)
    for c in range(3):
        out_ref[0, c] = outs[c]


def _isp_kernel_train(raw_ref, bl_ref, kdeb_ref, a_ref, minv_ref,
                      ksharp_ref, kblur_ref, gamma_ref, out_ref, res_ref):
    """Training forward: also stores the residual planes the hand-written
    backward kernel consumes instead of recomputing ~230 plane-ops/image
    (res layout: [deb0, deb1, deb2, s, t])."""
    outs, deb, s, t_lum = _isp_compute(
        raw_ref[0], bl_ref, kdeb_ref, a_ref, minv_ref, ksharp_ref,
        kblur_ref, gamma_ref)
    for c in range(3):
        out_ref[0, c] = outs[c]
        res_ref[0, c] = deb[c]
    res_ref[0, 3] = s
    res_ref[0, 4] = t_lum


def _pack_params(params):
    """Pallas-friendly param layout (all float32, SMEM-shaped)."""
    bl = jnp.asarray(params["black_level"], jnp.float32).reshape(1, 4)
    kdeb = jnp.asarray(params["debayer"], jnp.float32)  # (3,3,ci,co)
    kdeb2 = kdeb.reshape(9, 9)  # [tap, ci*3+co]
    wb = jnp.asarray(params["white_balance"], jnp.float32).reshape(3)
    ccm = jnp.asarray(params["colour_correction"], jnp.float32).reshape(3, 3)
    m_yuv = jnp.asarray(constants.M_RGB_2_YUV, jnp.float32)
    # HIGHEST like every ISP matmul: the TPU default truncates operands
    # to bf16 and the error in A multiplies every pixel (parity contract)
    hi = jax.lax.Precision.HIGHEST
    a = jnp.dot(jnp.dot(m_yuv, ccm, precision=hi), jnp.diag(wb),
                precision=hi)
    minv = jnp.asarray(constants.M_YUV_2_RGB, jnp.float32)
    ksharp = jnp.asarray(params["sharpening_filter"], jnp.float32)
    kblur = jnp.asarray(params["gaussian_blur"], jnp.float32)
    gamma = jnp.asarray(params["gamma_correct"], jnp.float32).reshape(1, 1)
    return bl, kdeb2, a, minv, ksharp, kblur, gamma


def _fused_fwd_planar(raw, packed, interpret):
    b, h, w = raw.shape
    bl, kdeb2, a, minv, ksharp, kblur, gamma = packed
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _isp_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            smem((1, 4)), smem((9, 9)), smem((3, 3)), smem((3, 3)),
            smem((3, 3)), smem((5, 5)), smem((1, 1)),
        ],
        out_specs=pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * (81 * 2 + 9 * 2 + 25 * 2 + 18 + 10),
            bytes_accessed=b * h * w * 4 * 4,
            transcendentals=b * h * w * 3 * 2,
        ),
    )(raw, bl, kdeb2, a, minv, ksharp, kblur, gamma)
    return out


def _fused_fwd_planar_train(raw, packed, interpret):
    """Forward + residual planes for the recompute-free backward kernel."""
    b, h, w = raw.shape
    bl, kdeb2, a, minv, ksharp, kblur, gamma = packed
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    out, res = pl.pallas_call(
        _isp_kernel_train,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            smem((1, 4)), smem((9, 9)), smem((3, 3)), smem((3, 3)),
            smem((3, 3)), smem((5, 5)), smem((1, 1)),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 5, h, w), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * (81 * 2 + 9 * 2 + 25 * 2 + 18 + 10),
            bytes_accessed=b * h * w * 4 * 9,
            transcendentals=b * h * w * 3 * 2,
        ),
    )(raw, bl, kdeb2, a, minv, ksharp, kblur, gamma)
    return out, res


def fused_isp_reference(raw, params):
    """Numerically-identical jnp composition (truth source + VJP donor).
    Matches ParametrizedProcessing with track_stages=False and
    batch_norm_output=False."""
    from raw2logit_tpu.isp.parametrized import _debayer_conv
    from raw2logit_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
    from raw2logit_tpu.ops.filters import conv2d_single
    from raw2logit_tpu.ops.mosaic import pack_raw

    rgb = pack_raw(raw, black_level=params["black_level"],
                   reduce_size=False)
    rgb = _debayer_conv(rgb, params["debayer"])
    rgb = rgb * jnp.reshape(params["white_balance"], (-1,))
    rgb = jnp.einsum("...c,kc->...k", rgb,
                     jnp.reshape(params["colour_correction"], (3, 3)),
                     precision=jax.lax.Precision.HIGHEST)
    yuv = rgb_to_yuv(rgb)
    y = conv2d_single(yuv[..., 0], params["sharpening_filter"],
                      pad_mode="zero")
    y = conv2d_single(y, params["gaussian_blur"], pad_mode="reflect")
    yuv = yuv.at[..., 0].set(y)
    rgb = yuv_to_rgb(yuv)
    rgb = jnp.clip(rgb, 1e-5, 1.0)
    return jnp.exp(jnp.log(rgb) / params["gamma_correct"])


def _is_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_isp(raw, params):
    """raw (B, H, W) + param dict -> RGB (B, H, W, 3). Pallas forward on
    TPU (interpreter elsewhere), jnp-derived backward."""
    packed = _pack_params(params)
    planar = _fused_fwd_planar(raw, packed, interpret=not _is_tpu())
    return jnp.transpose(planar, (0, 2, 3, 1))


def _bwd_choice():
    """Backward implementation: the hand-written Pallas kernel on real TPU
    (fused_isp_bwd.py) — Mosaic-clean selector-matrix pad/fold algebra,
    and it keeps the step's HLO small (the jnp-autodiff ISP backward is a
    program large enough that this environment's remote compile helper
    gets OOM-killed on it at bench batch sizes). Elsewhere (CPU mesh):
    differentiate the numerically-identical jnp composition — the truth
    source, and interpret-mode Pallas would be slow. R2L_FUSED_BWD
    overrides either way ('pallas' | 'jnp')."""
    import os
    return os.environ.get("R2L_FUSED_BWD", "pallas" if _is_tpu() else "jnp")


def _fwd(raw, params):
    if _bwd_choice() == "pallas":
        # training forward emits the residual planes (deb, s, t) so the
        # backward kernel skips ~230 plane-ops/image of recompute; the
        # eval/primal path (fused_isp above) stays single-output
        packed = _pack_params(params)
        planar, res = _fused_fwd_planar_train(raw, packed,
                                              interpret=not _is_tpu())
        return jnp.transpose(planar, (0, 2, 3, 1)), (raw, params, res)
    return fused_isp(raw, params), (raw, params, None)


def _bwd(saved, g):
    raw, params, res = saved
    if _bwd_choice() == "pallas":
        from raw2logit_tpu.pallas.fused_isp_bwd import fused_isp_bwd_pallas
        return fused_isp_bwd_pallas(raw, params, g,
                                    interpret=not _is_tpu(), res=res)
    _, vjp = jax.vjp(fused_isp_reference, raw, params)
    return vjp(g)


fused_isp.defvjp(_fwd, _bwd)
