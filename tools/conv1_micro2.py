#!/usr/bin/env python
"""Locate XLA:TPU's im2col-vs-direct conv threshold in input channels.

conv1_micro showed the exact C=12 polyphase repacking of the stem conv
still runs at ~9% MFU forward — same im2col symptom as C=3. This sweeps
C for a 4x4/1 conv at stem-equivalent output shape to find where the
direct path kicks in, and dumps the optimized-HLO op mix for two points.

Usage: python tools/conv1_micro2.py [batch]
"""

import json
import os
import re
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report = {}
    for c in [12, 16, 24, 32, 48, 64, 128]:
        x = jnp.asarray(rng.uniform(size=(batch, 128, 128, c)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((4, 4, c, 64)) * 0.05,
                        jnp.bfloat16)
        jf = jax.jit(conv)
        tf = bench(jf, x, w)
        comp = jf.lower(x, w).compile()
        fl = float(comp.cost_analysis().get("flops", 0.0))
        by = float(comp.cost_analysis().get("bytes accessed", 0.0))
        report[f"C{c}"] = {
            "fwd_ms": round(tf * 1e3, 3),
            "fwd_mfu": round(fl / tf / PEAK, 3),
            "gbytes": round(by / 1e9, 2),
        }
        print(f"C={c:3d} {json.dumps(report[f'C{c}'])}", flush=True)
        if c in (12, 64):
            ops = re.findall(r"= (\w+)\(", comp.as_text())
            counts = {}
            for o in ops:
                counts[o] = counts.get(o, 0) + 1
            print(f"  HLO ops C={c}: {sorted(counts.items())}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/conv1_micro2.json", "w") as fh:
        json.dump({"batch": batch, "sweep": report}, fh, indent=2)


if __name__ == "__main__":
    main()
