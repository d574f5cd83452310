"""Hand-written Pallas backward kernel for the fused ISP.

Recompute strategy: the forward intermediates (scattered planes, debayered
RGB, YUV, sharpened/blurred luma, pre-clip values) are cheap VPU work, so
the backward kernel recomputes them from the raw mosaic instead of saving
residuals — zero extra HBM traffic vs the forward, one kernel for all
gradients.

Per grid step (one image) it emits draw plus PER-IMAGE param-gradient
partials (dbl, dK_debayer, dA, dK_sharp, dK_blur, dgamma); the wrapper sums
them over the batch and chains dA back to (d_white_balance, d_ccm).

Adjoint bookkeeping (the fiddly part): forward pads are
  * debayer: 1-px torch-'reflect'  -> backward: full-corr + reflect-fold-1
  * sharpen: 1-px zero             -> backward: full-corr + center-crop
  * blur:    2-px torch-'reflect'  -> backward: full-corr + reflect-fold-2
where full-corr(x, K)[u,v] = sum_ab K[a,b] x[u-a, v-b] over a zero-extended
x (the transpose of a VALID correlation).

Padding/folding is expressed as 0/1 SELECTOR-MATRIX MATMULS (pad2d(x) =
P_h x P_w^T, fold = its exact transpose P_h^T g P_w): Mosaic has no
lowering for dynamic_update_slice, and both concatenate and lax.pad reject
operands that carry sublane/lane layout offsets (the stencil slices here
always do); iota-built selector matmuls are layout-offset-agnostic and run
on the MXU. precision=HIGHEST keeps the 0/1 products exact in float32.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2logit_tpu.ops import constants


def _mm(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _pad_mat(n, k, mode, transpose=False):
    """(n+2k, n) 0/1 selector P with (P @ x) padding axis 0 of x by k
    ('zero' borders or torch-'reflect' borrow); transpose=True builds P^T
    directly (avoids a transpose op in the kernel)."""
    shape = (n, n + 2 * k) if transpose else (n + 2 * k, n)
    pad_ax, src_ax = (1, 0) if transpose else (0, 1)
    I = jax.lax.broadcasted_iota(jnp.int32, shape, pad_ax)  # padded index
    J = jax.lax.broadcasted_iota(jnp.int32, shape, src_ax)  # source index
    sel = J == I - k
    if mode == "reflect":
        if k == 1:
            sel |= (I == 0) & (J == 1)
            sel |= (I == n + 1) & (J == n - 2)
        else:
            sel |= (I == 0) & (J == 2)
            sel |= (I == 1) & (J == 1)
            sel |= (I == n + 2) & (J == n - 2)
            sel |= (I == n + 3) & (J == n - 3)
    return sel.astype(jnp.float32)


def _pad2d(x, k, mode):
    """Pad both axes by k: P_h @ x @ P_w^T."""
    h, w = x.shape
    return _mm(_mm(_pad_mat(h, k, mode), x),
               _pad_mat(w, k, mode, transpose=True))


def _fold2d(gp, k, mode):
    """Exact adjoint of _pad2d: P_h^T @ gp @ P_w."""
    h, w = gp.shape[0] - 2 * k, gp.shape[1] - 2 * k
    return _mm(_mm(_pad_mat(h, k, mode, transpose=True), gp),
               _pad_mat(w, k, mode))


def _pad1_reflect(x):
    return _pad2d(x, 1, "reflect")


def _pad2_reflect(x):
    return _pad2d(x, 2, "reflect")


def _pad1_zero(x):
    return _pad2d(x, 1, "zero")


def _padk_zero(x, k):
    return _pad2d(x, k, "zero")


def _stencil(xp, k_ref, ksize, h, w, flip=False, base=(0, 0)):
    """VALID correlation of padded plane with k_ref (optionally flipped)."""
    acc = None
    for i in range(ksize):
        for j in range(ksize):
            ki = ksize - 1 - i if flip else i
            kj = ksize - 1 - j if flip else j
            tap = xp[i:i + h, j:j + w] * k_ref[base[0] + ki, base[1] + kj]
            acc = tap if acc is None else acc + tap
    return acc


def _conv_full(x, k_ref, ksize, base=(0, 0)):
    """full-corr: out[u,v] = sum_ab K[a,b] x[u-a, v-b], out grows by
    ksize-1 per side. Implemented as zero-pad(ksize-1) + flipped VALID."""
    h, w = x.shape
    xp = _padk_zero(x, ksize - 1)
    return _stencil(xp, k_ref, ksize, h + ksize - 1, w + ksize - 1,
                    flip=True, base=base)


def _fold1_reflect(gp):
    """Adjoint of the 1-px torch-'reflect' pad: gp (H+2, W+2) -> (H, W)."""
    return _fold2d(gp, 1, "reflect")


def _fold2_reflect(gp):
    """Adjoint of the 2-px reflect pad: gp (H+4, W+4) -> (H, W)."""
    return _fold2d(gp, 2, "reflect")


def _bwd_kernel(raw_ref, g_ref, bl_ref, kdeb_ref, a_ref, minv_ref,
                ksharp_ref, kblur_ref, gamma_ref,
                draw_ref, dbl_ref, dkdeb_ref, da_ref, dksharp_ref,
                dkblur_ref, dgamma_ref):
    h, w = raw_ref.shape[1], raw_ref.shape[2]
    raw = raw_ref[0]

    # ---- recompute forward ------------------------------------------------
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2
    even_r, even_c = rows == 0, cols == 0
    r_mask = even_r & even_c
    g_mask = even_r ^ even_c
    b_mask = (~even_r) & (~even_c)
    bl_map = jnp.where(even_r,
                       jnp.where(even_c, bl_ref[0, 0], bl_ref[0, 1]),
                       jnp.where(even_c, bl_ref[0, 2], bl_ref[0, 3]))
    x = raw - bl_map
    planes = [jnp.where(r_mask, x, 0.0), jnp.where(g_mask, x, 0.0),
              jnp.where(b_mask, x, 0.0)]
    pads = [_pad1_reflect(p) for p in planes]

    deb = []
    for co in range(3):
        acc = None
        for ci in range(3):
            t = None
            for i in range(3):
                for j in range(3):
                    tap = pads[ci][i:i + h, j:j + w] * \
                        kdeb_ref[i * 3 + j, ci * 3 + co]
                    t = tap if t is None else t + tap
            acc = t if acc is None else acc + t
        deb.append(acc)

    yuv0 = [a_ref[k, 0] * deb[0] + a_ref[k, 1] * deb[1]
            + a_ref[k, 2] * deb[2] for k in range(3)]
    y0_pad = _pad1_zero(yuv0[0])
    s = _stencil(y0_pad, ksharp_ref, 3, h, w)
    s_pad = _pad2_reflect(s)
    t_lum = _stencil(s_pad, kblur_ref, 5, h, w)
    yuv = [t_lum, yuv0[1], yuv0[2]]

    inv_g = 1.0 / gamma_ref[0, 0]
    v = [minv_ref[c, 0] * yuv[0] + minv_ref[c, 1] * yuv[1]
         + minv_ref[c, 2] * yuv[2] for c in range(3)]
    cl = [jnp.clip(vc, 1e-5, 1.0) for vc in v]
    out = [jnp.exp(jnp.log(clc) * inv_g) for clc in cl]

    # ---- backward ----------------------------------------------------------
    gs = [g_ref[0, c] for c in range(3)]

    dgamma = jnp.zeros((), jnp.float32)
    dv = []
    for c in range(3):
        dout_dcl = out[c] * inv_g / cl[c]
        dcl = gs[c] * dout_dcl
        dgamma += jnp.sum(gs[c] * out[c] * (-jnp.log(cl[c]))
                          * inv_g * inv_g)
        in_range = (v[c] >= 1e-5) & (v[c] <= 1.0)
        dv.append(jnp.where(in_range, dcl, 0.0))
    dgamma_ref[0, 0, 0] = dgamma

    dt = minv_ref[0, 0] * dv[0] + minv_ref[1, 0] * dv[1] + \
        minv_ref[2, 0] * dv[2]
    dyuv1 = minv_ref[0, 1] * dv[0] + minv_ref[1, 1] * dv[1] + \
        minv_ref[2, 1] * dv[2]
    dyuv2 = minv_ref[0, 2] * dv[0] + minv_ref[1, 2] * dv[1] + \
        minv_ref[2, 2] * dv[2]

    # blur adjoint
    for a in range(5):
        for b in range(5):
            dkblur_ref[0, 0, a * 5 + b] = jnp.sum(
                dt * s_pad[a:a + h, b:b + w])
    ds = _fold2_reflect(_conv_full(dt, kblur_ref, 5))

    # sharpen adjoint (zero pad -> crop)
    for a in range(3):
        for b in range(3):
            dksharp_ref[0, 0, a * 3 + b] = jnp.sum(
                ds * y0_pad[a:a + h, b:b + w])
    dy0_full = _conv_full(ds, ksharp_ref, 3)
    dyuv0_0 = dy0_full[1:1 + h, 1:1 + w]

    dyuv0 = [dyuv0_0, dyuv1, dyuv2]

    # dA and ddeb
    ddeb = []
    for c in range(3):
        for k in range(3):
            da_ref[0, k, c] = jnp.sum(dyuv0[k] * deb[c])
        ddeb.append(a_ref[0, c] * dyuv0[0] + a_ref[1, c] * dyuv0[1]
                    + a_ref[2, c] * dyuv0[2])

    # debayer adjoint
    dp = []
    for ci in range(3):
        acc = None
        for co in range(3):
            for i in range(3):
                for j in range(3):
                    dkdeb_ref[0, i * 3 + j, ci * 3 + co] = jnp.sum(
                        ddeb[co] * pads[ci][i:i + h, j:j + w])
            # full-corr with the (ci, co) sub-kernel
            t = None
            xp = _padk_zero(ddeb[co], 2)
            for i in range(3):
                for j in range(3):
                    tap = xp[i:i + h + 2, j:j + w + 2] * \
                        kdeb_ref[(2 - i) * 3 + (2 - j), ci * 3 + co]
                    t = tap if t is None else t + tap
            acc = t if acc is None else acc + t
        dp.append(_fold1_reflect(acc))

    draw = jnp.where(r_mask, dp[0],
                     jnp.where(g_mask, dp[1], dp[2]))
    draw_ref[0] = draw

    dbl_ref[0, 0, 0] = -jnp.sum(jnp.where(r_mask, dp[0], 0.0))
    dbl_ref[0, 0, 1] = -jnp.sum(jnp.where(even_r & (~even_c), dp[1], 0.0))
    dbl_ref[0, 0, 2] = -jnp.sum(jnp.where((~even_r) & even_c, dp[1], 0.0))
    dbl_ref[0, 0, 3] = -jnp.sum(jnp.where(b_mask, dp[2], 0.0))


def fused_isp_bwd_pallas(raw, params, g_nhwc, interpret):
    """raw (B,H,W), params dict, cotangent (B,H,W,3) -> (draw, param grads).

    Returns grads in the same tree structure as ``params``."""
    from raw2logit_tpu.pallas.fused_isp import _pack_params

    b, h, w = raw.shape
    bl, kdeb2, a, minv, ksharp, kblur, gamma = _pack_params(params)
    g_planar = jnp.transpose(g_nhwc, (0, 3, 1, 2)).astype(jnp.float32)

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    smem_out = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),      # draw
        jax.ShapeDtypeStruct((b, 1, 4), jnp.float32),      # dbl
        jax.ShapeDtypeStruct((b, 9, 9), jnp.float32),      # dkdeb
        jax.ShapeDtypeStruct((b, 3, 3), jnp.float32),      # dA
        jax.ShapeDtypeStruct((b, 1, 9), jnp.float32),     # dksharp
        jax.ShapeDtypeStruct((b, 1, 25), jnp.float32),     # dkblur
        jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),      # dgamma
    )
    out_specs = (
        pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        smem_out((1, 4)), smem_out((9, 9)), smem_out((3, 3)),
        smem_out((1, 9)), smem_out((1, 25)), smem_out((1, 1)),
    )

    draw, dbl_b, dkdeb_b, da_b, dksharp_b, dkblur_b, dgamma_b = \
        pl.pallas_call(
            _bwd_kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                smem((1, 4)), smem((9, 9)), smem((3, 3)), smem((3, 3)),
                smem((3, 3)), smem((5, 5)), smem((1, 1)),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            # the unrolled recompute keeps ~90 (H, W) f32 planes live at
            # 256^2; the 16 MB default scoped-vmem stack is too small
            # (v5e has 128 MB VMEM)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(raw, g_planar, bl, kdeb2, a, minv, ksharp, kblur, gamma)

    # reduce per-image partials and chain dA -> (dwb, dccm)
    dbl = jnp.sum(dbl_b, axis=0).reshape(4)
    dkdeb = jnp.sum(dkdeb_b, axis=0).reshape(3, 3, 3, 3)
    da = jnp.sum(da_b, axis=0)
    dksharp = jnp.sum(dksharp_b, axis=0).reshape(3, 3)
    dkblur = jnp.sum(dkblur_b, axis=0).reshape(5, 5)
    dgamma = jnp.sum(dgamma_b, axis=0).reshape(())

    m = jnp.asarray(constants.M_RGB_2_YUV, jnp.float32)
    wb = jnp.asarray(params["white_balance"], jnp.float32).reshape(3)
    ccm = jnp.asarray(params["colour_correction"], jnp.float32).reshape(3, 3)
    mt_da = _mm(m.T, da)                   # (3, 3): d(CCM @ diag(wb))
    dccm = mt_da * wb[None, :]
    dwb = jnp.sum(ccm * mt_da, axis=0)

    dparams = {
        "black_level": dbl.reshape(
            jnp.shape(params["black_level"])).astype(
                jnp.asarray(params["black_level"]).dtype),
        "debayer": dkdeb,
        "white_balance": dwb.reshape(jnp.shape(params["white_balance"])),
        "colour_correction": dccm.reshape(
            jnp.shape(params["colour_correction"])),
        "sharpening_filter": dksharp,
        "gaussian_blur": dkblur,
        "gamma_correct": dgamma.reshape(jnp.shape(params["gamma_correct"])),
    }
    return draw, dparams
