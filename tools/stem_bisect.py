#!/usr/bin/env python
"""Compile each fused-stem Pallas program separately on the real chip to
localize a server-side Mosaic crash (layout.h check failure seen when
compiling the full grad program). Usage: python tools/stem_bisect.py
[which ...] with which in conv_fwd bnpool b1 b2."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.pallas import stem as S

    which = sys.argv[1:] or ["conv_fwd", "bnpool", "b1", "b2"]
    B, H, W = 8, 256, 256
    Hp, Wp = H // 2, W // 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    xs = S.space_to_depth(x, dt)
    xp = S.pad_phase_planes(xs)
    w = jnp.asarray(rng.normal(scale=0.1, size=(7, 7, 3, 64)), jnp.float32)
    w4, w4t = S.pack_weights(w, dt)
    act = jnp.asarray(rng.normal(size=(B, 64, Hp, Wp)), dt)
    d_pool = jnp.asarray(rng.normal(size=(B, 64, Hp // 2, Wp // 2)), dt)
    d_n = jnp.asarray(rng.normal(size=(B, 64, Hp, Wp)), dt)
    ch = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    sel_r, sel_c = S.selectors(Hp, Wp, dt)

    if "conv_fwd" in which:
        out = jax.jit(lambda xp, w4: S._conv_fwd(xp, w4, dt, False))(xp, w4)
        print("conv_fwd ok:", [float(jnp.sum(o.astype(jnp.float32)))
                               for o in out][:1], flush=True)
    if "bnpool" in which:
        out = jax.jit(lambda a: S._bnpool_fwd(a, ch, ch, sel_r, sel_c, dt,
                                              False))(act)
        print("bnpool ok:", float(jnp.sum(out.astype(jnp.float32))),
              flush=True)
    if "b1" in which:
        out = jax.jit(lambda a, d: S._pool_bn_bwd(
            a, d, ch, ch, ch, jnp.abs(ch) + 1, sel_r, sel_c, dt,
            False))(act, d_pool)
        print("b1 ok:", float(jnp.sum(out[0].astype(jnp.float32))),
              flush=True)
    if "b2" in which:
        out = jax.jit(lambda xp, a, d: S._conv_bwd(
            xp, a, d, ch, ch, ch, ch, jnp.abs(ch) + 1, w4t,
            False))(xp, act, d_n)
        print("b2 ok:", float(jnp.sum(out[1])), flush=True)
    print("bisect done")


if __name__ == "__main__":
    main()
