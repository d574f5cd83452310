#!/usr/bin/env python
"""Micro-timing of the ISP pieces on the real chip: Pallas fwd/bwd kernels
alone, the planar<->NHWC transposes, and the output BatchNorm — to
attribute profile_step.py's isp_fwd/isp_bwd times (VERDICT r3 item 1).

Usage: python tools/isp_micro.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def bench(name, fn, *args, steps=20):
    import jax
    out = None
    for _ in range(3):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])  # true barrier: drain the one-time load
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:28s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.pallas.fused_isp import (_fused_fwd_planar_train,
                                                _pack_params, fused_isp)
    from raw2logit_tpu.pallas.fused_isp_bwd import fused_isp_bwd_pallas

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    size = 256
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)
    g = jnp.asarray(rng.uniform(size=(batch, size, size, 3)), jnp.float32)

    proc = ParametrizedProcessing(
        camera_parameters=MICROSCOPY_CAMERA_PARAMS, image_size=size,
        use_pallas=True)
    pvars = proc.init(jax.random.key(0), raw[:1], train=False)
    params = {k: v for k, v in pvars["params"].items()}

    fwd_eval = jax.jit(lambda r, p: fused_isp(r, p))
    bench("fused_isp fwd (eval)", fwd_eval, raw, params)

    fwd_train = jax.jit(
        lambda r, p: _fused_fwd_planar_train(r, _pack_params(p), False))
    bench("fwd train (w/ residuals)", fwd_train, raw, params)
    res = fwd_train(raw, params)[1]

    bwd = jax.jit(lambda r, p, gg, rr: fused_isp_bwd_pallas(
        r, p, gg, interpret=False, res=rr))
    bench("pallas bwd (residual)", bwd, raw, params, g, res)

    # the full processor apply (pallas + batchnorm) fwd and param-vjp,
    # exactly the staged programs' content
    def apply_train(p, stats, r):
        (rgb, _), mut = proc.apply({"params": p, "batch_stats": stats},
                                   r, train=True, mutable=["batch_stats"])
        return rgb, mut["batch_stats"]

    stats = pvars.get("batch_stats", {})
    bench("processor.apply train=True",
          jax.jit(apply_train), params, stats, raw)

    def param_vjp(p, stats, r, gg):
        def f(p):
            rgb, _ = proc.apply({"params": p, "batch_stats": stats}, r,
                                train=True, mutable=["batch_stats"])[0]
            return rgb
        _, vjp = jax.vjp(f, p)
        return vjp(gg)[0]

    bench("full isp param vjp", jax.jit(param_vjp), params, stats, raw, g)


if __name__ == "__main__":
    main()
