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

    # channel-stacked separable form: the five conv operands concatenated
    # to one C=15 depthwise conv pair (5x the lane occupancy of five C=3
    # convs; numerically identical — depthwise is per-channel)
    from raw2logit_tpu.ops.ssim import _depthwise, _gauss_np

    def ssim_stacked(img1, img2):
        g = _gauss_np(11)
        s = jnp.concatenate([img1, img2, img1 * img1, img2 * img2,
                             img1 * img2], axis=-1)
        s = _depthwise(_depthwise(s, g[:, None]), g[None, :])
        c = img1.shape[-1]
        mu1, mu2, m11, m22, m12 = (s[..., i * c:(i + 1) * c]
                                   for i in range(5))
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1_mu2 + c1) * (2 * (m12 - mu1_mu2) + c2)) / (
            (mu1_sq + mu2_sq + c1) * ((m11 - mu1_sq) + (m22 - mu2_sq) + c2))
        return jnp.mean(m)

    fwd_s = jax.jit(ssim_stacked)
    vg_s = jax.jit(lambda x, y: jax.value_and_grad(
        lambda yy: ssim_stacked(x, yy))(y))
    report["stacked"] = {
        "fwd_ms": round(time_fn(fwd_s, (a, b), steps, float) * 1e3, 3),
        "value_and_grad_ms": round(time_fn(
            vg_s, (a, b), steps, lambda o: float(o[0])) * 1e3, 3)}
    print("stacked", json.dumps(report["stacked"]), flush=True)

    # fused Pallas value+grad kernel (the aux_grad fast path)
    from raw2logit_tpu.pallas.ssim_aux import ssim_aux_value_grad
    ap = jnp.transpose(a, (0, 3, 1, 2))
    bp = jnp.transpose(b, (0, 3, 1, 2))
    vg_k = jax.jit(lambda x, y: ssim_aux_value_grad(x, y, 1.0))
    report["pallas_fused"] = {
        "value_and_grad_ms": round(time_fn(
            vg_k, (ap, bp), steps, lambda o: float(o[0])) * 1e3, 3)}
    print("pallas_fused", json.dumps(report["pallas_fused"]), flush=True)

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
