#!/usr/bin/env python
"""conv1 space-to-depth experiment on the real chip.

The ResNet stem's 7x7/2 conv over C=3 input runs at ~8% MFU: XLA's TPU
conv emitter materializes a ~1.2 GB im2col for sub-lane channel counts
(ROUND3_NOTES 'leads for round 4'). This measures the polyphase
reformulation: split the input into its 4 spatial parities (12 channels
at half resolution) and run the EXACT same linear map as a 4x4/1 conv
with C=12 — enough channels to dodge the im2col path.

Variants timed at bench shapes (batch 256, bf16, 256^2 -> 128^2 x64):
  ref          7x7/2 pad3 conv on (B,256,256,3)
  s2d12        4x4/1 pad(2,1) conv on pre-formed (B,128,128,12)
  s2d12_nhwc   same, but forming the 12 parity planes from the NHWC
               input INSIDE the program (strided slices) — the
               emission cost XLA actually pays
  s2d12_planar same, from planar f32 (B,3,256,256) — the fused-ISP
               kernel's native output layout (production path)

Each fwd and fwd+bwd (d/dx + d/dw). A batch-2 equivalence check pins
the weight repacking w12[kh,kw,(pr*2+pc)*3+ch,o] = w7[2kh-4+pr+3,
2kw-4+pc+3, ch, o] (zero where the index leaves [0,7)).

Usage: python tools/conv1_micro.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

PEAK = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))


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


def repack_w12(w7):
    """(7,7,3,O) -> (4,4,12,O), c12 = (pr*2+pc)*3 + ch."""
    import numpy as np
    w7 = np.asarray(w7)
    o = w7.shape[-1]
    w12 = np.zeros((4, 4, 12, o), w7.dtype)
    for kh in range(4):
        for kw in range(4):
            for pr in range(2):
                for pc in range(2):
                    r = 2 * (kh - 2) + pr + 3
                    c = 2 * (kw - 2) + pc + 3
                    if 0 <= r < 7 and 0 <= c < 7:
                        w12[kh, kw, (pr * 2 + pc) * 3:(pr * 2 + pc) * 3 + 3] \
                            = w7[r, c]
    return w12


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)

    def conv_ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv12(x12, w12):
        return jax.lax.conv_general_dilated(
            x12, w12, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def to12_nhwc(x):
        return jnp.concatenate(
            [x[:, pr::2, pc::2, :] for pr in range(2) for pc in range(2)],
            axis=-1)

    def to12_planar(xp):
        # (B,3,H,W) f32 -> (B,H/2,W/2,12) bf16
        planes = jnp.concatenate(
            [xp[:, :, pr::2, pc::2] for pr in range(2) for pc in range(2)],
            axis=1)
        return jnp.transpose(planes, (0, 2, 3, 1)).astype(jnp.bfloat16)

    # --- equivalence check (batch 2, f32 for a tight bound) ---
    xs = jnp.asarray(rng.standard_normal((2, 256, 256, 3)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    w12s = jnp.asarray(repack_w12(ws))
    got = jax.jit(lambda x, w: conv12(to12_nhwc(x), w))(xs, w12s)
    want = jax.jit(conv_ref)(xs, ws)
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want)))
    print(f"equivalence: max|diff|={err:.3e} (scale {scale:.2f})",
          flush=True)
    assert err < 1e-3 * max(scale, 1.0), "s2d repacking mismatch"

    # --- timing at bench shapes ---
    x = jnp.asarray(rng.uniform(size=(batch, 256, 256, 3)), jnp.bfloat16)
    xp = jnp.asarray(rng.uniform(size=(batch, 3, 256, 256)), jnp.float32)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05,
                     jnp.bfloat16)
    w12 = jnp.asarray(repack_w12(np.asarray(w7, np.float32)),
                      jnp.bfloat16)
    x12 = jax.jit(to12_nhwc)(x)

    variants = {
        "ref": (lambda x, w: conv_ref(x, w), x, w7),
        "s2d12": (lambda x, w: conv12(x, w), x12, w12),
        "s2d12_nhwc": (lambda x, w: conv12(to12_nhwc(x), w), x, w12),
        "s2d12_planar": (lambda x, w: conv12(to12_planar(x), w), xp, w12),
    }

    report = {}
    for name, (f, xin, win) in variants.items():
        jf = jax.jit(f)

        def fwd_bwd(xin, win, f=f):
            def loss(xin, win):
                return jnp.sum(f(xin, win).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(xin, win)

        jb = jax.jit(fwd_bwd)
        tf = bench(jf, xin, win)
        tb = bench(jb, xin, win)
        fl = float(jf.lower(xin, win).compile().cost_analysis()
                   .get("flops", 0.0))
        flb = float(jb.lower(xin, win).compile().cost_analysis()
                    .get("flops", 0.0))
        report[name] = {
            "fwd_ms": round(tf * 1e3, 3),
            "fwd_bwd_ms": round(tb * 1e3, 3),
            "fwd_mfu": round(fl / tf / PEAK, 3),
            "fwd_bwd_mfu": round(flb / tb / PEAK, 3),
        }
        print(f"{name:14s} {json.dumps(report[name])}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/conv1_micro.json", "w") as fh:
        json.dump({"batch": batch, "variants": report}, fh, indent=2)


if __name__ == "__main__":
    main()
