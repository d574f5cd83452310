#!/usr/bin/env python
"""Attribute the adversarial step's aux_grad program and measure the
separable-vs-dense SSIM window convolution on the real chip.

The SSIM aux loss (reference utils/ssim.py via utils/base.py:346-358) is
6 gaussian-window depthwise convs forward plus their vjps — at C=3 the
dense 11x11 form is lane-starved like conv1. The window is an outer
product, so the separable (11x1 then 1x11) form is exact.

Usage: python tools/ssim_micro.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def time_fn(fn, args, steps, fetch):
    out = None
    for _ in range(3):
        out = fn(*args)
    float(fetch(out))  # true D2H barrier past the one-time program load
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(fetch(out))
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.ops.ssim import ssim

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = 256

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)

    report = {"batch": batch, "size": size}
    for name, sep in (("separable", True), ("dense", False)):
        fwd = jax.jit(lambda x, y, s=sep: ssim(x, y, separable=s))
        vg = jax.jit(lambda x, y, s=sep: jax.value_and_grad(
            lambda yy: ssim(x, yy, separable=s))(y))
        t_fwd = time_fn(fwd, (a, b), steps, float)
        t_vg = time_fn(vg, (a, b), steps, lambda o: float(o[0]))
        report[name] = {"fwd_ms": round(t_fwd * 1e3, 3),
                        "value_and_grad_ms": round(t_vg * 1e3, 3)}
        print(name, json.dumps(report[name]), flush=True)

    # cross-check the two forms agree on-chip too
    s_sep = float(jax.jit(lambda x, y: ssim(x, y))(a, b))
    s_dense = float(jax.jit(lambda x, y: ssim(x, y, separable=False))(a, b))
    report["agreement"] = {"separable": s_sep, "dense": s_dense,
                           "abs_diff": abs(s_sep - s_dense)}
    print("agreement", json.dumps(report["agreement"]), flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/ssim_micro.json", "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
