#!/usr/bin/env python
"""Stem-maxpool experiment on the real chip.

The ResNet stem's 3x3/2 maxpool backward lowers to an overlapping
select-and-scatter that round-3 measured at 16.6 ms fwd+bwd standalone at
batch 256 (HBM roofline ~2-3 ms); the gather rewrite made it WORSE
(26.9 ms, commit e2f8568). This probes an exact algebraic decomposition
instead: 3x3/2 (pad 1) == [2x2/1 pool, pad (1,0)] then [2x2/2 pool]
(per axis: max(a[2i], a[2i+1]) with a[j] = max(x[j-1], x[j]) covers
x[2i-1..2i+1]) — two SMALL select-and-scatters, one of them
non-overlapping, in place of one 3x3 overlapping one.

Usage: python tools/pool_micro.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    rng = np.random.default_rng(0)
    # stem shape after conv1+BN+relu: (B, 128, 128, 64) NHWC bf16
    x = jnp.asarray(rng.standard_normal((batch, 128, 128, 64)),
                    jnp.bfloat16)

    def pool_3x3(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def pool_2stage(x):
        a = nn.max_pool(x, (2, 2), strides=(1, 1),
                        padding=((1, 0), (1, 0)))
        return nn.max_pool(a, (2, 2), strides=(2, 2), padding="VALID")

    # forward equivalence on this input (exact: same set of taps)
    ref = pool_3x3(x)
    alt = pool_2stage(x)
    assert ref.shape == alt.shape, (ref.shape, alt.shape)
    assert bool(jnp.all(ref == alt)), "decomposition mismatch"
    print("forward exact-equal: ok", flush=True)

    def timed(name, fn):
        g = jax.jit(jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32))))
        out = None
        for _ in range(3):
            out = g(x)
        float(out.astype(jnp.float32).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(x)
        float(out.astype(jnp.float32).ravel()[0])
        dt = (time.perf_counter() - t0) / steps
        print(f"{name:12s} {dt * 1e3:.3f} ms (fwd+bwd)", flush=True)
        return round(dt * 1e3, 3)

    report = {
        "pool_3x3": timed("pool_3x3", pool_3x3),
        "pool_2stage": timed("pool_2stage", pool_2stage),
    }
    os.makedirs("results", exist_ok=True)
    with open("results/pool_micro.json", "w") as fh:
        json.dump({"batch": batch, **report}, fh, indent=2)


if __name__ == "__main__":
    main()
