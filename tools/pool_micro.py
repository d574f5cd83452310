#!/usr/bin/env python
"""Stem maxpool backward experiment on the real chip.

XLA differentiates reduce_window maxpool via select-and-scatter — a
known multi-ms cost at stem shapes (B,128,128,64). max is associative,
so pool3x3/2 == pool3x1/(2,1) then pool1x3/(1,2): the separable form
backpropagates through two 3-tap select-and-scatters (the second over a
half-height intermediate) instead of one 9-tap pass. Values are
bit-identical; only gradient tie-routing can differ (both are valid
subgradients; ties need exact float equality between neighbors).

Usage: python tools/pool_micro.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def bench(fn, *args, steps=20):
    import jax
    out = None
    for _ in range(3):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 128, 128, 64)),
                    jnp.bfloat16)

    def pool2d(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def pool_sep(x):
        y = nn.max_pool(x, (3, 1), strides=(2, 1), padding=((1, 1), (0, 0)))
        return nn.max_pool(y, (1, 3), strides=(1, 2), padding=((0, 0), (1, 1)))

    # value equivalence
    a = jax.jit(pool2d)(x[:2])
    b = jax.jit(pool_sep)(x[:2])
    assert bool(jnp.all(a == b)), "separable maxpool mismatch"
    print("values identical", flush=True)

    report = {}
    for name, f in [("pool2d", pool2d), ("pool_sep", pool_sep)]:
        def fwd_bwd(x, f=f):
            return jax.grad(
                lambda x: jnp.sum(f(x).astype(jnp.float32) ** 2))(x)
        jf, jb = jax.jit(f), jax.jit(fwd_bwd)
        report[name] = {
            "fwd_ms": round(bench(jf, x) * 1e3, 3),
            "fwd_bwd_ms": round(bench(jb, x) * 1e3, 3),
        }
        print(f"{name:9s} {json.dumps(report[name])}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/pool_micro.json", "w") as fh:
        json.dump({"batch": batch, "variants": report}, fh, indent=2)


if __name__ == "__main__":
    main()
