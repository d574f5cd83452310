#!/usr/bin/env python
"""Feasibility probe: does this backend lower int8 matmul/conv at speed?

v5e's MXU runs int8 at ~2x the bf16 peak; if the remote backend lowers
jnp int8 dot/conv natively this justifies a quantized inference mode in
serving.py. Times an MXU-shaped dot and a 3x3 conv in bf16 vs int8.

Usage: python tools/int8_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def time_fn(fn, *args, steps=30):
    import numpy as np
    import jax.numpy as jnp
    out = fn(*args)
    for _ in range(2):
        out = fn(*args)
    assert np.isfinite(float(jnp.ravel(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    assert np.isfinite(float(jnp.ravel(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)
    res = {}

    # MXU-shaped GEMM: (16384, 1024) x (1024, 1024)
    a = rng.integers(-127, 127, size=(16384, 1024))
    b = rng.integers(-127, 127, size=(1024, 1024))
    a16, b16 = jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16)
    a8, b8 = jnp.asarray(a, jnp.int8), jnp.asarray(b, jnp.int8)

    @jax.jit
    def dot16(x, y):
        return lax.dot(x, y, preferred_element_type=jnp.float32)

    @jax.jit
    def dot8(x, y):
        return lax.dot(x, y, preferred_element_type=jnp.int32)

    res["dot_bf16_ms"] = round(time_fn(dot16, a16, b16) * 1e3, 4)
    res["dot_int8_ms"] = round(time_fn(dot8, a8, b8) * 1e3, 4)

    # conv 3x3, C=128->128 at 64^2, batch 32 (layer-ish shape), NHWC
    x = rng.integers(-127, 127, size=(32, 64, 64, 128))
    w = rng.integers(-127, 127, size=(3, 3, 128, 128))
    x16, w16 = jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16)
    x8, w8 = jnp.asarray(x, jnp.int8), jnp.asarray(w, jnp.int8)
    dn = lax.conv_dimension_numbers(x16.shape, w16.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv16(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)

    @jax.jit
    def conv8(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.int32)

    res["conv_bf16_ms"] = round(time_fn(conv16, x16, w16) * 1e3, 4)
    try:
        res["conv_int8_ms"] = round(time_fn(conv8, x8, w8) * 1e3, 4)
    except Exception as e:  # lowering may be unsupported
        res["conv_int8_error"] = str(e)[:300]

    print(json.dumps(res))
    os.makedirs("results", exist_ok=True)
    with open("results/int8_probe.json", "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
