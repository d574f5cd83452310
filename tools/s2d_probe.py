#!/usr/bin/env python
"""Probe: can a space-to-depth (s2d) reformulation speed up the U-Net++
full-resolution decoder rows on the chip?

Context (results/profile_step_seg.json + /tmp/seg_clf_grad_b64.hlo tally):
the seg clf_grad program runs at 11% MFU; decoder rows 0/1 convs have
C_out=16/32 (12.5%/25% MXU lane efficiency) and the 16-channel full-res
tensors drag ~23 GB of layout copies/slices/concats per step.

The s2d form is EXACT: x (B,H,W,C) <-> X (B,H/2,W/2,4C) with channel
blocks (pi,pj,c); a 3x3 SAME conv becomes a 3x3 SAME conv in block space
with a dense (3,3,4Ci,4Co) kernel whose entries are
  W2[bi,bj,(qi,qj,ci),(pi,pj,co)] = W[di+1,dj+1,ci,co]
    where di = 2*bi-2+qi-pi, dj = 2*bj-2+qj-pj, valid iff |di|,|dj| <= 1
(structural zeros elsewhere): 4x the FLOPs at 4x the lane width.

Run CPU first for exactness: env -u ... JAX_PLATFORMS=cpu python
tools/s2d_probe.py check. Then on the chip: python tools/s2d_probe.py
[cin] [cout] [batch] for timings.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def expand_kernel(w):
    """(3,3,Ci,Co) -> dense block-space (3,3,4Ci,4Co) with structural
    zeros (see module docstring)."""
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((3, 3, 4, ci, 4, co), w.dtype)
    for bi in range(3):
        for bj in range(3):
            for pi in range(2):
                for pj in range(2):
                    for qi in range(2):
                        for qj in range(2):
                            di = 2 * bi - 2 + qi - pi
                            dj = 2 * bj - 2 + qj - pj
                            if -1 <= di <= 1 and -1 <= dj <= 1:
                                w2 = w2.at[bi, bj, qi * 2 + qj, :,
                                           pi * 2 + pj, :].set(
                                    w[di + 1, dj + 1])
    return w2.reshape(3, 3, 4 * ci, 4 * co)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def block_std(x, w0, w1):
    """conv3x3 -> relu -> conv3x3 (BN elided: elementwise, identical in
    both forms; the probe isolates conv+layout behavior)."""
    return conv(jax.nn.relu(conv(x, w0)), w1)


def block_s2d(xs, w0, w1):
    return conv(jax.nn.relu(conv(xs, expand_kernel(w0))),
                expand_kernel(w1))


def check():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 5)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 7, 3)), jnp.float32)
    ref = block_std(x, w0, w1)
    out = d2s(block_s2d(s2d(x), w0, w1))
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"fwd max err: {err:.2e}")
    g_ref = jax.grad(lambda w: jnp.sum(block_std(x, w, w1) ** 2))(w0)
    g_s2d = jax.grad(lambda w: jnp.sum(block_s2d(s2d(x), w, w1) ** 2))(w0)
    gerr = float(jnp.max(jnp.abs(g_ref - g_s2d))
                 / (float(jnp.max(jnp.abs(g_ref))) + 1e-30))
    print(f"dw0 max rel err: {gerr:.2e}")
    assert err < 1e-3 and gerr < 1e-5
    print("s2d formulation exact")


def timeit(fn, args, steps=20):
    out = None
    for _ in range(3):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # true barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
        return
    cin = int(sys.argv[1]) if len(sys.argv) > 1 else 99
    cout = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 256, 256, cin)),
                    jnp.bfloat16)
    xs = s2d(x)
    w0 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                     jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cout, cout)) * 0.05,
                     jnp.bfloat16)

    def grad_std(x, w0, w1):
        def f(ws):
            y = block_std(x, ws[0], ws[1])
            return jnp.sum(y.astype(jnp.float32) ** 2), y
        (_, y), g = jax.value_and_grad(f, has_aux=True)((w0, w1))
        return y, g

    def grad_s2d(xs, w0, w1):
        def f(ws):
            y = block_s2d(xs, ws[0], ws[1])
            return jnp.sum(y.astype(jnp.float32) ** 2), y
        (_, y), g = jax.value_and_grad(f, has_aux=True)((w0, w1))
        return y, g

    report = {"cin": cin, "cout": cout, "batch": batch}
    for name, fn, args in (
            ("fwd_std", jax.jit(block_std), (x, w0, w1)),
            ("fwd_s2d", jax.jit(block_s2d), (xs, w0, w1)),
            ("grad_std", jax.jit(grad_std), (x, w0, w1)),
            ("grad_s2d", jax.jit(grad_s2d), (xs, w0, w1))):
        dt = timeit(fn, args)
        report[name + "_ms"] = round(dt * 1e3, 3)
        print(f"{name:9s} {dt*1e3:8.3f} ms", flush=True)
    os.makedirs("results", exist_ok=True)
    path = f"results/s2d_probe_{cin}_{cout}_b{batch}.json"
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
