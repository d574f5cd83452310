"""Bayer mosaic packing / black-level ops.

Reference semantics: ``raw2rgb`` (processing/pipeline_torch.py:240-283) and
``remove_blacklv`` (processing/pipeline_numpy.py:152-158). RGGB pattern:
R at (even, even), G1 at (even, odd), G2 at (odd, even), B at (odd, odd).

Layout: raw input is (B, H, W); outputs are NHWC.
"""

import jax.numpy as jnp


def subtract_black_level_cfa(raw, black_level):
    """Subtract per-site black level from a CFA mosaic, keeping (B, H, W).

    Mirrors remove_blacklv (pipeline_numpy.py:152-158) without the in-place
    mutation.
    """
    black_level = jnp.asarray(black_level, dtype=raw.dtype)
    # Build a (2, 2)-periodic black-level image and subtract in one fused op.
    bl_tile = jnp.array(
        [[black_level[0], black_level[1]],
         [black_level[2], black_level[3]]], dtype=raw.dtype)
    h, w = raw.shape[-2], raw.shape[-1]
    bl_full = jnp.tile(bl_tile, (h // 2 + h % 2, w // 2 + w % 2))[:h, :w]
    return raw - bl_full


def pack_raw(raw, black_level=None, reduce_size=True, out_channels=3):
    """raw (B, H, W) -> NHWC color planes.

    reduce_size=True:  (B, H//2, W//2, C) — half-resolution planes; for
        out_channels=3 the two greens are averaged.
    reduce_size=False: (B, H, W, C) — sparse mosaic scatter, zeros at
        missing sites (input to convolutional debayering).

    Mirrors raw2rgb (pipeline_torch.py:240-283), NHWC instead of NCHW.
    """
    assert out_channels in (3, 4)
    if black_level is None:
        black_level = jnp.zeros((4,), dtype=raw.dtype)
    black_level = jnp.asarray(black_level, dtype=raw.dtype)

    r = raw[:, 0::2, 0::2] - black_level[0]
    g1 = raw[:, 0::2, 1::2] - black_level[1]
    g2 = raw[:, 1::2, 0::2] - black_level[2]
    b = raw[:, 1::2, 1::2] - black_level[3]

    if reduce_size:
        if out_channels == 3:
            return jnp.stack([r, (g1 + g2) / 2.0, b], axis=-1)
        return jnp.stack([r, g1, g2, b], axis=-1)

    bsz, h, w = raw.shape
    out = jnp.zeros((bsz, h, w, out_channels), dtype=raw.dtype)
    if out_channels == 3:
        out = out.at[:, 0::2, 0::2, 0].set(r)
        out = out.at[:, 0::2, 1::2, 1].set(g1)
        out = out.at[:, 1::2, 0::2, 1].set(g2)
        out = out.at[:, 1::2, 1::2, 2].set(b)
    else:
        out = out.at[:, 0::2, 0::2, 0].set(r)
        out = out.at[:, 0::2, 1::2, 1].set(g1)
        out = out.at[:, 1::2, 0::2, 2].set(g2)
        out = out.at[:, 1::2, 1::2, 3].set(b)
    return out


def bayer_masks(h, w, dtype=jnp.float32):
    """(R, G, B) binary site masks for an RGGB CFA of shape (h, w)."""
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    even_r, even_c = (rows % 2 == 0), (cols % 2 == 0)
    r_m = (even_r & even_c).astype(dtype)
    b_m = (~even_r & ~even_c).astype(dtype)
    g_m = ((even_r & ~even_c) | (~even_r & even_c)).astype(dtype)
    return r_m, g_m, b_m
