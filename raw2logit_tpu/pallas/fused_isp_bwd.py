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

import contextvars

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2logit_tpu.ops import constants


def _mm(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _split3(x):
    """Three-term bf16 split: x == hi + mid + lo to ~2^-26 relative.
    Two terms are NOT enough here: cotangent terms near the 1e-5 clip
    floor reach ~1e3-1e5 and cancel in the fold sums, so a 2^-17 split
    error became ~3e-2 absolute on the summed gradient."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# Interpret-mode Pallas on the TPU backend does not honor
# preferred_element_type on bf16 dots (the sums come back bf16-
# quantized), which would make the compiled-vs-interpret parity test
# compare against a degraded reference. While tracing an interpret-mode
# kernel the selector matmuls therefore use plain HIGHEST-precision f32
# (within ~2^-26 of the split — far inside the parity tolerances).
# A ContextVar (not a module global) so that an interpret-mode trace and
# a compiled-mode trace running concurrently (threads / async tracing)
# cannot see each other's precision mode.
_EXACT_MM = contextvars.ContextVar("fused_isp_bwd_exact_mm", default=False)


def _mm_sel_x(p_sel, x, terms=3):
    """0/1-selector @ data with the data split into ``terms`` DEFAULT
    (single-pass bf16) matmuls. The selector is EXACT in bf16, so each
    pass is an exact f32-accumulated copy — 3 MXU passes instead of
    HIGHEST's 6. The cotangent path needs terms=3 (~2^-26) because its
    near-clip-floor terms reach ~1e5 and cancel in the fold sums. The
    bwd kernel runs ~26 selector matmuls per image; they are a third of
    its runtime."""
    if _EXACT_MM.get():
        return _mm(p_sel, x)
    ps = p_sel.astype(jnp.bfloat16)
    return sum(jnp.dot(ps, t, preferred_element_type=jnp.float32)
               for t in _split3(x)[:terms])


def _mm_x_sel(x, p_sel, terms=3):
    if _EXACT_MM.get():
        return _mm(x, p_sel)
    ps = p_sel.astype(jnp.bfloat16)
    return sum(jnp.dot(t, ps, preferred_element_type=jnp.float32)
               for t in _split3(x)[:terms])


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


def _pad2d(x, k, mode, terms=3):
    """Pad both axes by k: P_h @ x @ P_w^T."""
    h, w = x.shape
    return _mm_x_sel(_mm_sel_x(_pad_mat(h, k, mode), x, terms),
                     _pad_mat(w, k, mode, transpose=True), terms)


def _fold2d(gp, k, mode):
    """Exact adjoint of _pad2d: P_h^T @ gp @ P_w."""
    h, w = gp.shape[0] - 2 * k, gp.shape[1] - 2 * k
    return _mm_x_sel(_mm_sel_x(_pad_mat(h, k, mode, transpose=True), gp),
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


def _cat_padk_zero(x, k):
    """Concatenate-based k-px zero pad — valid ONLY for offset-0-layout
    operands (fresh elementwise/MXU results); Mosaic rejects it for
    stencil-slice-carrying values (use _padk_zero there)."""
    h, w = x.shape
    z_row = jnp.zeros((k, w), x.dtype)
    x = jnp.concatenate([z_row, x, z_row], axis=0)
    z_col = jnp.zeros((h + 2 * k, k), x.dtype)
    return jnp.concatenate([z_col, x, z_col], axis=1)


def _conv_full(x, k_ref, ksize, base=(0, 0), cat_pad=False):
    """full-corr: out[u,v] = sum_ab K[a,b] x[u-a, v-b], out grows by
    ksize-1 per side. Implemented as zero-pad(ksize-1) + flipped VALID."""
    h, w = x.shape
    xp = (_cat_padk_zero if cat_pad else _padk_zero)(x, ksize - 1)
    return _stencil(xp, k_ref, ksize, h + ksize - 1, w + ksize - 1,
                    flip=True, base=base)


def _fold1_reflect(gp):
    """Adjoint of the 1-px torch-'reflect' pad: gp (H+2, W+2) -> (H, W)."""
    return _fold2d(gp, 1, "reflect")


def _fold2_reflect(gp):
    """Adjoint of the 2-px reflect pad: gp (H+4, W+4) -> (H, W)."""
    return _fold2d(gp, 2, "reflect")


# row layout of the per-image partials tensor (1, N_PARTIALS, W): every
# param-gradient scalar is reduced only along axis 0 (sublanes) in-kernel —
# a full 2-D->scalar reduction costs ~3-4 extra plane passes on the VPU and
# there are 129 of them, ~1/3 of the old kernel's time — the lane axis is
# summed OUTSIDE by XLA over the (B, N_PARTIALS, W) output (tiny).
_P_DKBLUR = 0           # 25 rows
_P_DKSHARP = 25         # 9
_P_DA = 34              # 9 (k*3+c)
_P_DKDEB = 43           # 81 ([i*3+j]*... laid out (i*3+j)*9 + ci*3+co)
_P_DBL = 124            # 4
_P_DGAMMA = 128         # 1
N_PARTIALS = 129


def _rowsum(x):
    return jnp.sum(x, axis=0, keepdims=True)  # (H, W) -> (1, W)


def _bwd_kernel(raw_ref, g_ref, bl_ref, kdeb_ref, a_ref, minv_ref,
                ksharp_ref, kblur_ref, gamma_ref,
                draw_ref, part_ref):
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

    _adjoint(g_ref, kdeb_ref, a_ref, minv_ref, ksharp_ref, kblur_ref,
             gamma_ref, draw_ref, part_ref,
             (r_mask, g_mask, b_mask, even_r, even_c),
             pads, deb, y0_pad, s_pad, yuv)


def _bwd_kernel_res(raw_ref, g_ref, res_ref, bl_ref, kdeb_ref, a_ref,
                    minv_ref, ksharp_ref, kblur_ref, gamma_ref,
                    draw_ref, part_ref):
    """Residual-consuming variant: the training forward saved deb/s/t
    (fused_isp.py _isp_kernel_train), so only the cheap mask/pad/pointwise
    pieces are rebuilt here (~230 plane-ops/image less recompute)."""
    h, w = raw_ref.shape[1], raw_ref.shape[2]
    raw = raw_ref[0]

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
    # fresh (offset-0 layout) values: the forward kernel's
    # concatenate-based pads compile here and are exact copies — the
    # selector-matmul pads are only needed for the cotangent path, whose
    # operands carry stencil-slice layout offsets Mosaic's concatenate
    # rejects
    from raw2logit_tpu.pallas.fused_isp import (_pad1_reflect as _cat_pad1,
                                                _pad1_zero as _cat_pad1z,
                                                _pad2_reflect as _cat_pad2)
    pads = [_cat_pad1(p) for p in planes]

    deb = [res_ref[0, c] for c in range(3)]
    s = res_ref[0, 3]
    t_lum = res_ref[0, 4]
    yuv0_0 = a_ref[0, 0] * deb[0] + a_ref[0, 1] * deb[1] \
        + a_ref[0, 2] * deb[2]
    yuv1 = a_ref[1, 0] * deb[0] + a_ref[1, 1] * deb[1] \
        + a_ref[1, 2] * deb[2]
    yuv2 = a_ref[2, 0] * deb[0] + a_ref[2, 1] * deb[1] \
        + a_ref[2, 2] * deb[2]
    y0_pad = _cat_pad1z(yuv0_0)
    s_pad = _cat_pad2(s)
    yuv = [t_lum, yuv1, yuv2]

    _adjoint(g_ref, kdeb_ref, a_ref, minv_ref, ksharp_ref, kblur_ref,
             gamma_ref, draw_ref, part_ref,
             (r_mask, g_mask, b_mask, even_r, even_c),
             pads, deb, y0_pad, s_pad, yuv)


def _adjoint(g_ref, kdeb_ref, a_ref, minv_ref, ksharp_ref, kblur_ref,
             gamma_ref, draw_ref, part_ref, masks, pads, deb, y0_pad,
             s_pad, yuv):
    r_mask, g_mask, b_mask, even_r, even_c = masks
    h, w = draw_ref.shape[1], draw_ref.shape[2]

    inv_g = 1.0 / gamma_ref[0, 0]
    v = [minv_ref[c, 0] * yuv[0] + minv_ref[c, 1] * yuv[1]
         + minv_ref[c, 2] * yuv[2] for c in range(3)]
    cl = [jnp.clip(vc, 1e-5, 1.0) for vc in v]
    out = [jnp.exp(jnp.log(clc) * inv_g) for clc in cl]

    gs = [g_ref[0, c] for c in range(3)]

    dgamma_row = None
    dv = []
    for c in range(3):
        dout_dcl = out[c] * inv_g / cl[c]
        dcl = gs[c] * dout_dcl
        t = _rowsum(gs[c] * out[c] * (-jnp.log(cl[c])) * inv_g * inv_g)
        dgamma_row = t if dgamma_row is None else dgamma_row + t
        in_range = (v[c] >= 1e-5) & (v[c] <= 1.0)
        dv.append(jnp.where(in_range, dcl, 0.0))
    part_ref[0, _P_DGAMMA:_P_DGAMMA + 1, :] = dgamma_row

    dt = minv_ref[0, 0] * dv[0] + minv_ref[1, 0] * dv[1] + \
        minv_ref[2, 0] * dv[2]
    dyuv1 = minv_ref[0, 1] * dv[0] + minv_ref[1, 1] * dv[1] + \
        minv_ref[2, 1] * dv[2]
    dyuv2 = minv_ref[0, 2] * dv[0] + minv_ref[1, 2] * dv[1] + \
        minv_ref[2, 2] * dv[2]

    # blur adjoint
    for a in range(5):
        for b in range(5):
            part_ref[0, _P_DKBLUR + a * 5 + b:_P_DKBLUR + a * 5 + b + 1, :] \
                = _rowsum(dt * s_pad[a:a + h, b:b + w])
    # dt is pure elementwise on loads (offset-0) and ds is a fold (MXU)
    # result — both take the exact concatenate zero-pad
    ds = _fold2_reflect(_conv_full(dt, kblur_ref, 5, cat_pad=True))

    # sharpen adjoint (zero pad -> crop)
    for a in range(3):
        for b in range(3):
            part_ref[0, _P_DKSHARP + a * 3 + b:
                     _P_DKSHARP + a * 3 + b + 1, :] = _rowsum(
                ds * y0_pad[a:a + h, b:b + w])
    dy0_full = _conv_full(ds, ksharp_ref, 3, cat_pad=True)
    dyuv0_0 = dy0_full[1:1 + h, 1:1 + w]

    dyuv0 = [dyuv0_0, dyuv1, dyuv2]

    # dA and ddeb
    ddeb = []
    for c in range(3):
        for k in range(3):
            part_ref[0, _P_DA + k * 3 + c:_P_DA + k * 3 + c + 1, :] = \
                _rowsum(dyuv0[k] * deb[c])
        ddeb.append(a_ref[0, c] * dyuv0[0] + a_ref[1, c] * dyuv0[1]
                    + a_ref[2, c] * dyuv0[2])

    # debayer adjoint. The zero-padded cotangent planes depend only on
    # co — hoisted out of the tap loop (fewer selector matmuls/image).
    # ddeb inherits dyuv0_0's stencil-slice layout offset — Mosaic rejects
    # concatenate here (verified); selector matmul stays
    xps = [_padk_zero(ddeb[co], 2) for co in range(3)]
    for ci in range(3):
        for co in range(3):
            for i in range(3):
                for j in range(3):
                    idx = _P_DKDEB + (i * 3 + j) * 9 + ci * 3 + co
                    part_ref[0, idx:idx + 1, :] = _rowsum(
                        ddeb[co] * pads[ci][i:i + h, j:j + w])

    # dxp(q) = sum_{t,co} ddeb_co(q-t) K[t, ch(q-1), co]: every mosaic
    # site feeds exactly ONE input channel, so the channel select factors
    # out per site — one site-coefficient full-corr + ONE fold replaces
    # three per-channel full-corrs + three folds (54 plane-ops and 4
    # selector matmuls fewer). On the (h+2, w+2) full-corr grid, position
    # q maps to source index q-1, so parity flips.
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (h + 2, w + 2), 0) % 2
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (h + 2, w + 2), 1) % 2
    src_even_r = rows2 == 1  # (q-1) even <=> q odd
    src_even_c = cols2 == 1
    acc = None
    for i in range(3):
        for j in range(3):
            t = (2 - i) * 3 + (2 - j)  # flipped tap index
            for co in range(3):
                coef = jnp.where(
                    src_even_r & src_even_c, kdeb_ref[t, 0 * 3 + co],
                    jnp.where((~src_even_r) & (~src_even_c),
                              kdeb_ref[t, 2 * 3 + co],
                              kdeb_ref[t, 1 * 3 + co]))
                tap = xps[co][i:i + h + 2, j:j + w + 2] * coef
                acc = tap if acc is None else acc + tap
    draw = _fold1_reflect(acc)
    draw_ref[0] = draw

    part_ref[0, _P_DBL + 0:_P_DBL + 1, :] = \
        -_rowsum(jnp.where(r_mask, draw, 0.0))
    part_ref[0, _P_DBL + 1:_P_DBL + 2, :] = \
        -_rowsum(jnp.where(even_r & (~even_c), draw, 0.0))
    part_ref[0, _P_DBL + 2:_P_DBL + 3, :] = \
        -_rowsum(jnp.where((~even_r) & even_c, draw, 0.0))
    part_ref[0, _P_DBL + 3:_P_DBL + 4, :] = \
        -_rowsum(jnp.where(b_mask, draw, 0.0))


def fused_isp_bwd_pallas(raw, params, g, interpret, res=None,
                         planar=False):
    """raw (B,H,W), params dict, cotangent -> (draw, param grads).

    ``g`` is the rgb cotangent: (B,H,W,3) by default, or already in the
    kernel's planar (B,3,H,W) layout when ``planar=True`` (the fast
    staged path keeps the program boundary planar — a transpose here
    would materialize, it cannot fuse into the pallas call).
    ``res`` (B, 5, H, W): residual planes from the training forward
    (deb0..2, s, t) — when given, the kernel skips the forward recompute.
    Returns grads in the same tree structure as ``params``."""
    from raw2logit_tpu.pallas.fused_isp import _pack_params

    b, h, w = raw.shape
    bl, kdeb2, a, minv, ksharp, kblur, gamma = _pack_params(params)
    if planar:
        g_planar = g.astype(jnp.float32)
    else:
        g_planar = jnp.transpose(g, (0, 3, 1, 2)).astype(jnp.float32)

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),            # draw
        jax.ShapeDtypeStruct((b, N_PARTIALS, w), jnp.float32),   # partials
    )
    out_specs = (
        pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N_PARTIALS, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    plane_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    smem_specs = [smem((1, 4)), smem((9, 9)), smem((3, 3)), smem((3, 3)),
                  smem((3, 3)), smem((5, 5)), smem((1, 1))]
    scalars = (bl, kdeb2, a, minv, ksharp, kblur, gamma)
    if res is not None:
        kernel = _bwd_kernel_res
        in_specs = [plane_spec, g_spec,
                    pl.BlockSpec((1, 5, h, w), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)] + smem_specs
        operands = (raw, g_planar, res) + scalars
    else:
        kernel = _bwd_kernel
        in_specs = [plane_spec, g_spec] + smem_specs
        operands = (raw, g_planar) + scalars

    token = _EXACT_MM.set(bool(interpret))  # see note above _mm_sel_x
    try:
        draw, part_b = \
            pl.pallas_call(
                kernel,
                grid=(b,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=interpret,
                # the unrolled recompute keeps ~90 (H, W) f32 planes live
                # at 256^2; the 16 MB default scoped-vmem stack is too
                # small (v5e has 128 MB VMEM)
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(*operands)
    finally:
        _EXACT_MM.reset(token)

    # finish the lane-axis + batch reduction outside (tiny: B x 129 x W)
    # and chain dA -> (dwb, dccm)
    scal = jnp.sum(part_b, axis=(0, 2))                      # (N_PARTIALS,)
    dkblur = scal[_P_DKBLUR:_P_DKBLUR + 25].reshape(5, 5)
    dksharp = scal[_P_DKSHARP:_P_DKSHARP + 9].reshape(3, 3)
    da = scal[_P_DA:_P_DA + 9].reshape(3, 3)
    dkdeb = scal[_P_DKDEB:_P_DKDEB + 81].reshape(3, 3, 3, 3)
    dbl = scal[_P_DBL:_P_DBL + 4]
    dgamma = scal[_P_DGAMMA].reshape(())

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
