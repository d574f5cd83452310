#!/usr/bin/env python
"""Per-stage ResNet18 attribution on the real chip: fwd and fwd+bwd time
of each stage at bench shapes (batch 256, bf16) — locates clf_grad's
remaining waste beyond conv1 (VERDICT r3 MFU follow-up; results feed
ROUND3_NOTES 'leads for round 4').

Usage: python tools/resnet_micro.py [batch]
"""

import json
import os
import sys
import time
from functools import partial

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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.models.resnet import BasicBlock

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            y = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=jnp.bfloat16)(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.bfloat16)(y)
            y = nn.relu(y)
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    class Stage(nn.Module):
        filters: int
        first_strides: tuple

        @nn.compact
        def __call__(self, x, train=True):
            norm = partial(nn.BatchNorm, use_running_average=not train,
                           momentum=0.9, epsilon=1e-5, dtype=jnp.bfloat16)
            conv = partial(nn.Conv, use_bias=False, dtype=jnp.bfloat16,
                           padding="SAME")
            for j in range(2):
                strides = self.first_strides if j == 0 else (1, 1)
                x = BasicBlock(self.filters, strides=strides, conv=conv,
                               norm=norm)(x)
            return x

    stages = [
        ("stem(conv1+bn+pool)", Stem(), (batch, 256, 256, 3)),
        ("layer1 2x64 @64^2", Stage(64, (1, 1)), (batch, 64, 64, 64)),
        ("layer2 2x128 /2", Stage(128, (2, 2)), (batch, 64, 64, 64)),
        ("layer3 2x256 /2", Stage(256, (2, 2)), (batch, 32, 32, 128)),
        ("layer4 2x512 /2", Stage(512, (2, 2)), (batch, 16, 16, 256)),
    ]

    report = {}
    for name, mod, shape in stages:
        x = jnp.asarray(rng.uniform(size=shape), jnp.bfloat16)
        vars_ = jax.jit(lambda m=mod, xx=x: m.init(key, xx,
                                                   train=False))()

        def fwd(v, xx, m=mod):
            out, _ = m.apply(v, xx, train=True, mutable=["batch_stats"])
            return out

        def fwd_bwd(v, xx, m=mod):
            def loss(v, xx):
                out, _ = m.apply(v, xx, train=True,
                                 mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(v, xx)

        jf = jax.jit(fwd)
        jb = jax.jit(fwd_bwd)
        tf = bench(jf, vars_, x)
        tb = bench(jb, vars_, x)
        fl = float(jf.lower(vars_, x).compile().cost_analysis()
                   .get("flops", 0.0))
        flb = float(jb.lower(vars_, x).compile().cost_analysis()
                    .get("flops", 0.0))
        report[name] = {
            "fwd_ms": round(tf * 1e3, 3),
            "fwd_bwd_ms": round(tb * 1e3, 3),
            "fwd_mfu": round(fl / tf / PEAK, 3),
            "fwd_bwd_mfu": round(flb / tb / PEAK, 3),
        }
        print(f"{name:22s} {json.dumps(report[name])}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/resnet_micro.json", "w") as fh:
        json.dump({"batch": batch, "stages": report}, fh, indent=2)


if __name__ == "__main__":
    main()
