"""Fused ResNet stem (7x7/2 conv + train-mode BatchNorm + ReLU + 3x3/2
maxpool) as hand-written Pallas TPU kernels with a custom VJP.

Why: the stem is the measured MFU floor of the classification train step
— conv1 + pool run at <=8.5% MFU / 30.5 ms standalone at batch 256
(results/profile_clf_layers.json) against an 18.3 ms roofline, and every
XLA-level reformulation (space-to-depth, gather pool, exact 2-stage pool,
conv1 variants) measured slower (ROUND3/4_NOTES.md). This is the kernel-
level attack VERDICT r4 item 4 asks for: keep the (B,128,128,64) stem
activation's traffic to ONE write + reads, fuse BN/ReLU into the pool
pass, and replace XLA's select-and-scatter pool backward with a
gather-style kernel.

Hardware mapping (see /opt/skills/guides/pallas_guide.md):

  * stride-2 is absorbed by a 2x2 space-to-depth done in XLA (a pure
    relayout): the 7x7/2 conv over (H,W,3) becomes a DENSE 4x4 conv over
    12 channel-phase planes of (H/2, W/2) — no strided memory access
    anywhere in the kernels (Mosaic has no lane-strided loads/stores).
  * the 3->64 channel expansion is MXU work: per 16-row block the 16
    tap-shifted (12, 16, W/2) slabs are assembled into an im2col scratch
    S (192, 16, W/2) with plain shifted slices of a zero-padded plane
    (the concatenate-free layout: padding happens once in XLA), then one
    (64,192) @ (192,16,W/2) dot_general per block.
  * train-mode BN needs batch statistics of the conv output, so the
    forward is two passes: the conv kernel accumulates per-channel
    sum/sumsq as a grid-carried side output; the bnpool kernel then
    consumes folded (alpha, beta) coefficients.
  * the 3x3/2 maxpool: dense 3x3 max via pltpu.roll + boundary masks,
    then even-row/even-column extraction as SELECTOR MATMULS (0/1
    matrices; each output element is a sum with exactly one nonzero
    term, so extraction is exact in bf16) — the same trick
    pallas/fused_isp_bwd.py uses for stencil adjoints.
  * pool backward is GATHER-style: the pooled cotangent is spread to
    even positions (transposed selector matmuls), and each dense
    position sums the <=9 windows whose recomputed argmax tap selects
    it. First-max-wins ties; ties at relu zeros are absorbed by the relu
    backward mask, and positive bf16 ties are the only (rare) divergence
    from XLA's select-and-scatter.
  * BN backward is the closed train-mode form: d_a = g1 * (d_n - c1 -
    xhat * c2) with per-channel reductions grid-accumulated in pass B1
    and folded coefficients consumed by pass B2, which also computes dW
    (im2col contraction) and d_xs (transposed-conv accumulation into a
    padded VMEM scratch) in one pass over d_n.

Replaces the stem of resnet_model (reference model.py:15-23 /
torchvision resnet) for the classifier path; parameter/batch-stats trees
stay bit-identical to the flax stem (models/resnet.py integration), so
checkpoints are interchangeable.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2logit_tpu.pallas.fused_isp import _is_tpu

RB = 16  # rows per conv/bwd block (output rows of the phase plane)


# --------------------------------------------------------------------------
# XLA-side packing helpers (pure relayouts / tiny math)


def space_to_depth(x_nhwc, dtype):
    """(B,H,W,3) -> (B,12,H/2,W/2) channel-phase planes, cp = c*4+a*2+b
    for x[b, 2u+a, 2v+b, c]."""
    B, H, W, C = x_nhwc.shape
    xs = x_nhwc.reshape(B, H // 2, 2, W // 2, 2, C)
    xs = xs.transpose(0, 5, 2, 4, 1, 3)  # (B, C, a, b, u, v)
    return xs.reshape(B, C * 4, H // 2, W // 2).astype(dtype)


def depth_to_space_grad(d_xs, H, W):
    """Adjoint of space_to_depth: (B,12,H/2,W/2) -> (B,H,W,3)."""
    B = d_xs.shape[0]
    d = d_xs.reshape(B, 3, 2, 2, H // 2, W // 2)
    d = d.transpose(0, 4, 2, 5, 3, 1)  # (B, u, a, v, b, C)
    return d.reshape(B, H, W, 3)


def pack_weights(w, dtype):
    """flax (7,7,3,64) HWIO kernel -> (w4 (64,192), w4T (192,192->64)).

    Row layout of the 192-contraction: row = (sy*4+sx)*12 + (c*4+a*2+b),
    matching the im2col assembly order; w4[o, row] = w[2sy-1+a, 2sx-1+b,
    c, o] (zero where the 7x7 index falls outside — the s2d'd 4x4 grid
    has 192 slots for the 147 real taps)."""
    wp = jnp.zeros((8, 8, 3, 64), w.dtype).at[1:8, 1:8].set(w)
    # (ky+1, kx+1) = (2sy+a, 2sx+b)
    w4 = wp.reshape(4, 2, 4, 2, 3, 64)            # (sy, a, sx, b, c, o)
    w4 = w4.transpose(0, 2, 4, 1, 3, 5)           # (sy, sx, c, a, b, o)
    w4 = w4.reshape(192, 64)
    return w4.T.astype(dtype), w4.astype(dtype)   # (64,192), (192,64)


def pad_phase_planes(xs):
    """Zero-pad (B,12,Hp,Wp) -> (B,12,Hp+3,Wp+3): 2 top/left, 1
    bottom/right (the dense 4x4 conv's support). XLA does the pad once so
    the kernels only ever slice."""
    return jnp.pad(xs, ((0, 0), (0, 0), (2, 1), (2, 1)))


def selectors(Hp, Wp, dtype):
    """0/1 extraction matrices: SelC (Wp, Wp/2) takes even columns by
    right-matmul; SelR (Hp/2, Hp) takes even rows by left-matmul."""
    sel_c = jnp.zeros((Wp, Wp // 2), dtype).at[
        2 * jnp.arange(Wp // 2), jnp.arange(Wp // 2)].set(1)
    sel_r = jnp.zeros((Hp // 2, Hp), dtype).at[
        jnp.arange(Hp // 2), 2 * jnp.arange(Hp // 2)].set(1)
    return sel_r, sel_c


TAPS4 = [(sy, sx) for sy in range(4) for sx in range(4)]
TAPS3 = [(dy, dx) for dy in range(3) for dx in range(3)]


def _roll_masked(x, shift, axis, fill):
    """Shift ``x`` by +shift along ``axis`` (value at i comes from
    i-shift), filling vacated positions with ``fill`` — a pad-free
    shifted slice built from pltpu.roll + an iota boundary mask."""
    if shift == 0:
        return x
    n = x.shape[axis]
    rolled = pltpu.roll(x, shift % n, axis)  # roll wants shift >= 0
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift > 0:
        mask = idx >= shift
    else:
        mask = idx < n + shift
    return jnp.where(mask, rolled, jnp.asarray(fill, x.dtype))


# --------------------------------------------------------------------------
# forward kernels


def _conv_kernel(xp_ref, w4_ref, act_ref, stats_ref, s_scratch):
    """Dense 4x4 conv over 12 phase planes + per-channel sum/sumsq.

    xp_ref: (1, 12, Hp+3, Wp+3) zero-padded input phases (compute dtype)
    w4_ref: (64, 192) packed weights
    act_ref: (1, 64, Hp, Wp) conv output (compute dtype)
    stats_ref: (64, 128) float32, col 0 = sum, col 1 = sumsq — grid-
        accumulated (the TPU grid is sequential).
    s_scratch: (192, RB, Wp) im2col block
    """
    Hp = act_ref.shape[2]
    Wp = act_ref.shape[3]
    w4 = w4_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    s1 = jnp.zeros((64, 1), jnp.float32)
    s2 = jnp.zeros((64, 1), jnp.float32)
    for blk in range(Hp // RB):
        r0 = blk * RB
        for t, (sy, sx) in enumerate(TAPS4):
            s_scratch[t * 12:(t + 1) * 12, :, :] = \
                xp_ref[0, :, r0 + sy:r0 + sy + RB, sx:sx + Wp]
        out = jax.lax.dot_general(
            w4, s_scratch[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (64, RB, Wp)
        act_ref[0, :, r0:r0 + RB, :] = out.astype(act_ref.dtype)
        # reduce in two 2D steps: a rank-1 (64,) intermediate crashes the
        # Mosaic layout pass (layout.h implicit-dim check)
        s1 = s1 + jnp.sum(jnp.sum(out, axis=2), axis=1, keepdims=True)
        sq = out * out
        s2 = s2 + jnp.sum(jnp.sum(sq, axis=2), axis=1, keepdims=True)
    stats_ref[:, 0:1] += s1
    stats_ref[:, 1:2] += s2


def _dense_max3(r, fill):
    """3x3 dense max with implicit ``fill`` border (pool padding)."""
    mc = jnp.maximum(jnp.maximum(_roll_masked(r, 1, 2, fill), r),
                     _roll_masked(r, -1, 2, fill))
    return jnp.maximum(jnp.maximum(_roll_masked(mc, 1, 1, fill), mc),
                       _roll_masked(mc, -1, 1, fill))


def _bnpool_kernel(act_ref, coef_ref, selr_ref, selc_ref, out_ref):
    """BN (folded alpha/beta) + ReLU + 3x3/2 maxpool for one channel
    chunk: dense 3x3 max via rolls, then even-row/col selector matmuls.

    act_ref: (1, CB, Hp, Wp); coef_ref: (CB, 128) [col0 alpha, col1 beta]
    selr_ref: (Hp/2, Hp); selc_ref: (Wp, Wp/2)
    out_ref: (1, CB, Hp/2, Wp/2)
    """
    CB, Hp, Wp = act_ref.shape[1], act_ref.shape[2], act_ref.shape[3]
    a = act_ref[0].astype(jnp.float32)
    alpha = coef_ref[:, 0:1]
    beta = coef_ref[:, 1:2]
    n = a * alpha[:, :, None] + beta[:, :, None]
    r = jnp.maximum(n, 0.0)
    m = _dense_max3(r, -1.0)                      # r >= 0, -1 never wins
    md = m.astype(out_ref.dtype)
    cols = jax.lax.dot_general(                   # (CB, Hp, Wp/2)
        md, selc_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)
    for c in range(CB):                           # (Hp/2, Hp) @ (Hp, Wp/2)
        out_ref[0, c] = jnp.dot(
            selr_ref[:], cols[c],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


# --------------------------------------------------------------------------
# backward kernels


def _argmax_first(r, m):
    """First-max-wins tap id (0..8) per dense position, XLA select order."""
    idx = jnp.zeros(r.shape, jnp.float32)
    found = jnp.zeros(r.shape, jnp.bool_)
    for t, (dy, dx) in enumerate(TAPS3):
        tap = _roll_masked(_roll_masked(r, 1 - dy, 1, -1.0),
                           1 - dx, 2, -1.0)
        eq = jnp.logical_and(tap == m, jnp.logical_not(found))
        idx = jnp.where(eq, jnp.float32(t), idx)
        found = jnp.logical_or(found, eq)
    return idx


def _pool_bn_bwd_kernel(act_ref, dp_ref, coef_ref, spreadr_ref,
                        spreadc_ref, dn_ref, sums_ref, u_scratch):
    """B1: unpool (gather form) + relu mask + BN reduction sums.

    act_ref: (1, CB, Hp, Wp); dp_ref: (1, CB, Hp/2, Wp/2)
    coef_ref: (CB, 128) [alpha, beta, mean, inv_sigma]
    spreadr_ref: (Hp, Hp/2); spreadc_ref: (Wp/2, Wp)
    dn_ref: (1, CB, Hp, Wp) — d(BN output)
    sums_ref: (64, 128) f32 grid-accumulated [col0 sum(dn),
        col1 sum(dn*xhat)] (rows = absolute channel)
    """
    CB, Hp, Wp = act_ref.shape[1], act_ref.shape[2], act_ref.shape[3]
    a = act_ref[0].astype(jnp.float32)
    alpha = coef_ref[:, 0:1]
    beta = coef_ref[:, 1:2]
    mu = coef_ref[:, 2:3]
    inv = coef_ref[:, 3:4]
    n = a * alpha[:, :, None] + beta[:, :, None]
    r = jnp.maximum(n, 0.0)
    m = _dense_max3(r, -1.0)
    idx = _argmax_first(r, m)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    # spread pooled cotangent to even dense positions: U = SpR @ dp @ SpC
    dp = dp_ref[0].astype(spreadc_ref.dtype)
    ucols = jax.lax.dot_general(                  # (CB, Hp/2, Wp)
        dp, spreadc_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(spreadc_ref.dtype)
    for c in range(CB):
        u_scratch[c] = jnp.dot(spreadr_ref[:], ucols[c],
                               preferred_element_type=jnp.float32)
    u = u_scratch[:]                              # (CB, Hp, Wp) f32

    d_r = jnp.zeros((CB, Hp, Wp), jnp.float32)
    for t, (dy, dx) in enumerate(TAPS3):
        # window (i,j) tap t covers dense (2i+dy-1, 2j+dx-1): value at
        # (y,x) reads U/idx at (y+1-dy, x+1-dx) — shift by (dy-1, dx-1);
        # U's structural zeros at odd positions do the parity selection
        ut = _roll_masked(_roll_masked(u, dy - 1, 1, 0.0), dx - 1, 2, 0.0)
        it = _roll_masked(_roll_masked(idx, dy - 1, 1, -1.0),
                          dx - 1, 2, -1.0)
        d_r = d_r + jnp.where(it == jnp.float32(t), ut, 0.0)

    d_n = jnp.where(n > 0.0, d_r, 0.0)
    dn_ref[0] = d_n.astype(dn_ref.dtype)
    xhat = (a - mu[:, :, None]) * inv[:, :, None]
    # 2D-stepped reductions: rank-1 intermediates crash the Mosaic
    # layout pass
    sums_ref[:, 0:1] += jnp.sum(jnp.sum(d_n, axis=2), axis=1,
                                keepdims=True)
    dx_prod = d_n * xhat
    sums_ref[:, 1:2] += jnp.sum(jnp.sum(dx_prod, axis=2), axis=1,
                                keepdims=True)


RB_BWD = 8  # backward row block: the 16-row variant + double-buffered
#             (act, dn, xp) blocks exceeded the 16M scoped-VMEM stack


def _bn_input_cotangent_block(act_ref, dn_ref, coef, r0, rb):
    """d_a for one row block: closed-form train-BN input cotangent."""
    g1, c1, c2, mu, inv = coef
    a = act_ref[0, :, r0:r0 + rb, :].astype(jnp.float32)
    d_n = dn_ref[0, :, r0:r0 + rb, :].astype(jnp.float32)
    xhat = (a - mu[:, :, None]) * inv[:, :, None]
    return (g1[:, :, None]
            * (d_n - c1[:, :, None] - xhat * c2[:, :, None]))


def _unpack_coef(coef_ref):
    return (coef_ref[:, 0:1], coef_ref[:, 1:2], coef_ref[:, 2:3],
            coef_ref[:, 3:4], coef_ref[:, 4:5])


CBW = 16  # backward channel chunk: the full-64-channel variants exceed
#           the 16M scoped-VMEM stack once grid blocks double-buffer
#           (20.8M measured at batch 256); both conv-backward kernels
#           chunk the 64 output channels and grid-accumulate


def _conv_dw_kernel(xp_ref, act_ref, dn_ref, coef_ref, dw_ref, s_scratch):
    """B2a: dW by im2col contraction (one row at a time — Mosaic
    tpu.matmul wants exactly ONE contracting dim per side). Grid
    (B, 64/CBW): each cell contracts one channel chunk.

    xp_ref: (1, 12, Hp+3, Wp+3); act_ref/dn_ref: (1, CBW, Hp, Wp)
    coef_ref: (CBW, 128) [g1, c1, c2, mean, inv_sigma]
    dw_ref: (CBW, 192) f32 grid-accumulated over b
    s_scratch: (192, RB_BWD, Wp)
    """
    Hp, Wp = act_ref.shape[2], act_ref.shape[3]
    coef = _unpack_coef(coef_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw = jnp.zeros((CBW, 192), jnp.float32)
    for blk in range(Hp // RB_BWD):
        r0 = blk * RB_BWD
        d_a = _bn_input_cotangent_block(act_ref, dn_ref, coef, r0,
                                        RB_BWD).astype(xp_ref.dtype)
        for t, (sy, sx) in enumerate(TAPS4):
            s_scratch[t * 12:(t + 1) * 12, :, :] = \
                xp_ref[0, :, r0 + sy:r0 + sy + RB_BWD, sx:sx + Wp]
        s = s_scratch[:]
        for r in range(RB_BWD):
            dw = dw + jax.lax.dot_general(         # (CBW, 192)
                d_a[:, r, :], s[:, r, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    dw_ref[:] += dw


def _conv_dxs_kernel(act_ref, dn_ref, coef_ref, w4t_ref, dxs_ref,
                     dxs_scratch):
    """B2b: d_xs by transposed conv into a padded VMEM accumulator.
    Grid (B, 64/CBW), channel chunk minor: the scratch accumulates the
    chunks' contributions across the sequential c-steps (TPU scratch
    persists across grid iterations) and the output block — revisited
    by every c — flushes once per item.

    act_ref/dn_ref: (1, CBW, Hp, Wp); w4_ref: (CBW, 192) — the chunk's
    rows of w4 (a (192, CBW) chunk of w4T would violate the 128-lane
    block rule; (CBW, 192) has lanes == the full dim)
    dxs_ref: (1, 12, Hp, Wp) f32; dxs_scratch: (12, Hp+3, Wp+3) f32
    """
    Hp, Wp = act_ref.shape[2], act_ref.shape[3]
    coef = _unpack_coef(coef_ref)
    w4c = w4t_ref[:]                               # (CBW, 192)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dxs_scratch[:] = jnp.zeros_like(dxs_scratch)

    for blk in range(Hp // RB_BWD):
        r0 = blk * RB_BWD
        d_a = _bn_input_cotangent_block(act_ref, dn_ref, coef, r0,
                                        RB_BWD).astype(w4c.dtype)
        for t, (sy, sx) in enumerate(TAPS4):
            mt = jax.lax.dot_general(              # (12, RB_BWD, Wp)
                w4c[:, t * 12:(t + 1) * 12], d_a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxs_scratch[:, r0 + sy:r0 + sy + RB_BWD, sx:sx + Wp] += mt
    dxs_ref[0] = dxs_scratch[:, 2:2 + Hp, 2:2 + Wp]


# --------------------------------------------------------------------------
# pallas_call wrappers


def _vmem(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _conv_fwd(xp, w4, dtype, interpret):
    B, _, Hp3, Wp3 = xp.shape
    Hp, Wp = Hp3 - 3, Wp3 - 3
    act, stats = pl.pallas_call(
        _conv_kernel,
        grid=(B,),
        in_specs=[
            _vmem((1, 12, Hp3, Wp3), lambda b: (b, 0, 0, 0)),
            _vmem((64, 192), lambda b: (0, 0)),
        ],
        out_specs=(
            _vmem((1, 64, Hp, Wp), lambda b: (b, 0, 0, 0)),
            _vmem((64, 128), lambda b: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 64, Hp, Wp), dtype),
            jax.ShapeDtypeStruct((64, 128), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((192, RB, Wp), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 64 * 192 * Hp * Wp,
            bytes_accessed=B * (12 * Hp3 * Wp3 + 64 * Hp * Wp) * 2,
            transcendentals=0),
    )(xp, w4)
    return act, stats[:, 0], stats[:, 1]


def _bnpool_fwd(act, alpha, beta, sel_r, sel_c, dtype, interpret, cb=16):
    B, C, Hp, Wp = act.shape
    coef = jnp.stack([alpha, beta], axis=1)        # (64, 2)
    coef = jnp.pad(coef, ((0, 0), (0, 126))).astype(jnp.float32)
    out = pl.pallas_call(
        _bnpool_kernel,
        grid=(B, C // cb),
        in_specs=[
            _vmem((1, cb, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((cb, 128), lambda b, c: (c, 0)),
            _vmem((Hp // 2, Hp), lambda b, c: (0, 0)),
            _vmem((Wp, Wp // 2), lambda b, c: (0, 0)),
        ],
        out_specs=_vmem((1, cb, Hp // 2, Wp // 2),
                        lambda b, c: (b, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp // 2, Wp // 2), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * C * Hp * Wp * 12,
            bytes_accessed=B * C * Hp * Wp * 3,
            transcendentals=0),
    )(act, coef, sel_r, sel_c)
    return out


def _pool_bn_bwd(act, d_pool, alpha, beta, mu, inv, sel_r, sel_c,
                 dtype, interpret, cb=8):
    # cb=8: at cb=16 the kernel's live f32 planes (n, r, m, idx, u, d_r,
    # roll temps) hit 18.6M scoped VMEM vs the 16M stack limit (measured
    # server-side OOM); halving the channel chunk halves every plane
    B, C, Hp, Wp = act.shape
    coef = jnp.stack([alpha, beta, mu, inv], axis=1)
    coef = jnp.pad(coef, ((0, 0), (0, 124))).astype(jnp.float32)
    spread_r = sel_r.T.astype(dtype)               # (Hp, Hp/2)
    spread_c = sel_c.T.astype(dtype)               # (Wp/2, Wp)
    d_n, sums = pl.pallas_call(
        _pool_bn_bwd_kernel,
        grid=(B, C // cb),
        in_specs=[
            _vmem((1, cb, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((1, cb, Hp // 2, Wp // 2), lambda b, c: (b, c, 0, 0)),
            _vmem((cb, 128), lambda b, c: (c, 0)),
            _vmem((Hp, Hp // 2), lambda b, c: (0, 0)),
            _vmem((Wp // 2, Wp), lambda b, c: (0, 0)),
        ],
        out_specs=(
            _vmem((1, cb, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((cb, 128), lambda b, c: (c, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, Hp, Wp), dtype),
            jax.ShapeDtypeStruct((C, 128), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((cb, Hp, Wp), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * C * Hp * Wp * 40,
            bytes_accessed=B * C * Hp * Wp * 5,
            transcendentals=0),
    )(act, d_pool, coef, spread_r, spread_c)
    return d_n, sums[:, 0], sums[:, 1]


def _conv_bwd(xp, act, d_n, g1, c1, c2, mu, inv, w4t, interpret):
    B, _, Hp3, Wp3 = xp.shape
    Hp, Wp = Hp3 - 3, Wp3 - 3
    coef = jnp.stack([g1, c1, c2, mu, inv], axis=1)
    coef = jnp.pad(coef, ((0, 0), (0, 123))).astype(jnp.float32)
    dw = pl.pallas_call(
        _conv_dw_kernel,
        grid=(B, 64 // CBW),
        in_specs=[
            _vmem((1, 12, Hp3, Wp3), lambda b, c: (b, 0, 0, 0)),
            _vmem((1, CBW, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((1, CBW, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((CBW, 128), lambda b, c: (c, 0)),
        ],
        out_specs=_vmem((CBW, 192), lambda b, c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 192), jnp.float32),
        scratch_shapes=[pltpu.VMEM((192, RB_BWD, Wp), xp.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 64 * 192 * Hp * Wp,
            bytes_accessed=B * (12 * Hp3 * Wp3 + 2 * 64 * Hp * Wp) * 2,
            transcendentals=0),
    )(xp, act, d_n, coef)
    d_xs = pl.pallas_call(
        _conv_dxs_kernel,
        grid=(B, 64 // CBW),
        in_specs=[
            _vmem((1, CBW, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((1, CBW, Hp, Wp), lambda b, c: (b, c, 0, 0)),
            _vmem((CBW, 128), lambda b, c: (c, 0)),
            _vmem((CBW, 192), lambda b, c: (c, 0)),
        ],
        out_specs=_vmem((1, 12, Hp, Wp), lambda b, c: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 12, Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((12, Hp3, Wp3), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 64 * 192 * Hp * Wp,
            bytes_accessed=B * (12 * Hp * Wp * 4 + 2 * 64 * Hp * Wp) * 2,
            transcendentals=0),
    )(act, d_n, coef, w4t.T)
    return d_xs, dw


def _unpack_dw(dw):
    """(64,192) tap-space weight grad -> flax (7,7,3,64)."""
    d = dw.T.reshape(4, 4, 3, 2, 2, 64)            # (sy, sx, c, a, b, o)
    d = d.transpose(0, 3, 1, 4, 2, 5)              # (sy, a, sx, b, c, o)
    return d.reshape(8, 8, 3, 64)[1:8, 1:8]


# --------------------------------------------------------------------------
# public op (custom VJP)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def stem_train(x, w, gamma, beta, eps=1e-5, compute_dtype=jnp.bfloat16,
               interpret=None):
    """Train-mode fused stem: (B,H,W,3) NHWC float32 -> pooled
    (B,H/4,W/4,64) NHWC compute_dtype, plus the conv output's batch
    mean/var (biased, like flax BatchNorm) for the running-stat update."""
    pooled, bm, bv, _, _ = _stem_train_fwd_impl(x, w, gamma, beta, eps,
                                                compute_dtype, interpret)
    return pooled, bm, bv


def _resolve_interpret(interpret):
    return (not _is_tpu()) if interpret is None else interpret


def _stem_train_fwd_impl(x, w, gamma, beta, eps, compute_dtype,
                         interpret):
    interpret = _resolve_interpret(interpret)
    B, H, W, _ = x.shape
    xs = space_to_depth(x, compute_dtype)
    xp = pad_phase_planes(xs)
    w4, w4t = pack_weights(w, compute_dtype)
    act, s1, s2 = _conv_fwd(xp, w4, compute_dtype, interpret)
    n_elem = B * (H // 2) * (W // 2)
    bm = s1 / n_elem
    bv = jnp.maximum(s2 / n_elem - bm * bm, 0.0)
    inv = jax.lax.rsqrt(bv + eps)
    alpha = gamma * inv
    bshift = beta - bm * alpha
    sel_r, sel_c = selectors(H // 2, W // 2, compute_dtype)
    pooled = _bnpool_fwd(act, alpha, bshift, sel_r, sel_c, compute_dtype,
                         interpret)
    pooled_nhwc = pooled.transpose(0, 2, 3, 1)
    return pooled_nhwc, bm, bv, (xp, act, w4t, bm, inv), (alpha, bshift)


def _stem_train_fwd(x, w, gamma, beta, eps, compute_dtype, interpret):
    pooled, bm, bv, res, coefs = _stem_train_fwd_impl(
        x, w, gamma, beta, eps, compute_dtype, interpret)
    xp, act, w4t, bmean, inv = res
    alpha, bshift = coefs
    resid = (xp, act, w4t, bmean, inv, alpha, bshift, gamma,
             x.shape[1], x.shape[2])
    return (pooled, bm, bv), resid


def _stem_train_bwd(eps, compute_dtype, interpret, resid, cts):
    interpret = _resolve_interpret(interpret)
    d_pooled, _, _ = cts  # batch mean/var feed the (undifferentiated)
    #                       running-stat update only
    xp, act, w4t, bm, inv, alpha, bshift, gamma, H, W = resid
    B = act.shape[0]
    Hp, Wp = act.shape[2], act.shape[3]
    sel_r, sel_c = selectors(Hp, Wp, compute_dtype)
    d_pool = d_pooled.transpose(0, 3, 1, 2)        # planar
    d_n, sd, sdx = _pool_bn_bwd(act, d_pool, alpha, bshift, bm, inv,
                                sel_r, sel_c, compute_dtype, interpret)
    n_elem = B * Hp * Wp
    d_gamma = sdx
    d_beta = sd
    g1 = gamma * inv
    c1 = sd / n_elem
    c2 = sdx / n_elem
    d_xs, dw = _conv_bwd(xp, act, d_n, g1, c1, c2, bm, inv, w4t,
                         interpret)
    d_x = depth_to_space_grad(d_xs, H, W)
    return d_x, _unpack_dw(dw), d_gamma, d_beta


stem_train.defvjp(_stem_train_fwd, _stem_train_bwd)


def stem_eval(x, w, gamma, beta, run_mean, run_var, eps=1e-5,
              compute_dtype=jnp.bfloat16, interpret=None):
    """Eval-mode fused stem (BN folded with running stats)."""
    interpret = _resolve_interpret(interpret)
    B, H, W, _ = x.shape
    xs = space_to_depth(x, compute_dtype)
    xp = pad_phase_planes(xs)
    w4, _ = pack_weights(w, compute_dtype)
    act, _, _ = _conv_fwd(xp, w4, compute_dtype, interpret)
    inv = jax.lax.rsqrt(run_var + eps)
    alpha = gamma * inv
    bshift = beta - run_mean * alpha
    sel_r, sel_c = selectors(H // 2, W // 2, compute_dtype)
    pooled = _bnpool_fwd(act, alpha, bshift, sel_r, sel_c, compute_dtype,
                         interpret)
    return pooled.transpose(0, 2, 3, 1)


def stem_reference(x, w, gamma, beta, mean, var, train, eps=1e-5,
                   dtype=jnp.float32, momentum=0.9):
    """Numerically-plain jnp stem (conv + BN + relu + 3x3/2 maxpool) —
    the truth source for the kernel tests; mirrors models/resnet.py's
    flax stem (nn.Conv + nn.BatchNorm + nn.max_pool)."""
    import flax.linen as nn
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if train:
        bm = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        bv = jnp.var(y.astype(jnp.float32), axis=(0, 1, 2))
        new_mean = momentum * mean + (1 - momentum) * bm
        new_var = momentum * var + (1 - momentum) * bv
    else:
        bm, bv = mean, var
        new_mean, new_var = mean, var
    yn = (y.astype(jnp.float32) - bm) * jax.lax.rsqrt(bv + eps)
    yn = (yn * gamma + beta).astype(dtype)
    r = nn.relu(yn)
    pooled = nn.max_pool(r, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))
    return pooled, new_mean, new_var
