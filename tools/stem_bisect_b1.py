#!/usr/bin/env python
"""Bisect INSIDE the stem B1 backward kernel: which construct crashes
the server-side Mosaic compiler. Variants:
  v1 spread-only: dp block read + the two spread matmuls -> write
  v2 v1 + dense max + first-wins argmax recompute
  v3 full B1 (the production kernel)
Usage: python tools/stem_bisect_b1.py v1 v2 v3
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from raw2logit_tpu.pallas import stem as S

    which = sys.argv[1:] or ["v1", "v2", "v3"]
    B, Hp, Wp, CB = 8, 128, 128, 16
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    act = jnp.asarray(rng.normal(size=(B, 64, Hp, Wp)), dt)
    d_pool = jnp.asarray(rng.normal(size=(B, 64, Hp // 2, Wp // 2)), dt)
    ch = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    sel_r, sel_c = S.selectors(Hp, Wp, dt)
    spread_r = sel_r.T.astype(dt)
    spread_c = sel_c.T.astype(dt)
    coef = jnp.stack([ch, ch, ch, jnp.abs(ch) + 1], axis=1)
    coef = jnp.pad(coef, ((0, 0), (0, 124))).astype(jnp.float32)

    def v1_kernel(act_ref, dp_ref, coef_ref, sr_ref, sc_ref, dn_ref,
                  sums_ref, u_scratch):
        @pl.when(pl.program_id(0) == 0)
        def _():
            sums_ref[:] = jnp.zeros_like(sums_ref)
        dp = dp_ref[0].astype(sc_ref.dtype)
        ucols = jax.lax.dot_general(
            dp, sc_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(sc_ref.dtype)
        for c in range(CB):
            u_scratch[c] = jnp.dot(sr_ref[:], ucols[c],
                                   preferred_element_type=jnp.float32)
        dn_ref[0] = u_scratch[:].astype(dn_ref.dtype)
        sums_ref[:, 0:1] += jnp.sum(jnp.sum(u_scratch[:], axis=2), axis=1,
                                    keepdims=True)

    def v2_kernel(act_ref, dp_ref, coef_ref, sr_ref, sc_ref, dn_ref,
                  sums_ref, u_scratch):
        @pl.when(pl.program_id(0) == 0)
        def _():
            sums_ref[:] = jnp.zeros_like(sums_ref)
        a = act_ref[0].astype(jnp.float32)
        alpha = coef_ref[:, 0:1]
        beta = coef_ref[:, 1:2]
        n = a * alpha[:, :, None] + beta[:, :, None]
        r = jnp.maximum(n, 0.0)
        m = S._dense_max3(r, -1.0)
        idx = S._argmax_first(r, m)
        dn_ref[0] = idx.astype(dn_ref.dtype)
        sums_ref[:, 0:1] += jnp.sum(jnp.sum(idx, axis=2), axis=1,
                                    keepdims=True)

    def run(kernel, name):
        d_n, sums = pl.pallas_call(
            kernel,
            grid=(B, 64 // CB),
            in_specs=[
                S._vmem((1, CB, Hp, Wp), lambda b, c: (b, c, 0, 0)),
                S._vmem((1, CB, Hp // 2, Wp // 2),
                        lambda b, c: (b, c, 0, 0)),
                S._vmem((CB, 128), lambda b, c: (c, 0)),
                S._vmem((Hp, Hp // 2), lambda b, c: (0, 0)),
                S._vmem((Wp // 2, Wp), lambda b, c: (0, 0)),
            ],
            out_specs=(
                S._vmem((1, CB, Hp, Wp), lambda b, c: (b, c, 0, 0)),
                S._vmem((CB, 128), lambda b, c: (c, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, 64, Hp, Wp), dt),
                jax.ShapeDtypeStruct((64, 128), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((CB, Hp, Wp), jnp.float32)],
        )(act, d_pool, coef, spread_r, spread_c)
        print(name, "ok:", float(jnp.sum(sums[:, 0])), flush=True)

    if "v1" in which:
        run(v1_kernel, "v1")
    if "v2" in which:
        run(v2_kernel, "v2")
    if "v3" in which:
        out = jax.jit(lambda a, d: S._pool_bn_bwd(
            a, d, ch, ch, ch, jnp.abs(ch) + 1, sel_r, sel_c, dt,
            False))(act, d_pool)
        print("v3 ok:", float(jnp.sum(out[1])), flush=True)
    print("b1 bisect done")


if __name__ == "__main__":
    main()
