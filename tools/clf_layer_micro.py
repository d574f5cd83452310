#!/usr/bin/env python
"""Per-layer fwd+bwd ledger for clf_grad on the real chip (VERDICT r3
item 3: clf_grad is ~75% of the headline step and its interior beyond
conv1 was unattributed).

Times each ResNet18 segment STANDALONE as its own jitted value-and-grad
program at the bench shapes (batch 256, bf16 compute): stem conv+BN+relu,
the 3x3/2 maxpool, each residual stage (layer1-4), and the head
(global-mean + fc + CE). Gradients flow to both params and the segment
input (matching the cotangent traffic the full backward pays), BN runs in
train mode. Each row gets XLA cost-analysis flops/bytes and its roofline
— the sum approximates the measured clf_grad program (cross-op fusion at
segment boundaries is the residue).

Replaces: the loop-free roofline the reference never had
(/root/reference/model.py:144-146 just calls loss.backward()).

Usage: python tools/clf_layer_micro.py [batch] [steps]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
PEAK_BYTES = float(os.environ.get("BENCH_PEAK_BYTES", 819e9))


def cost(executable):
    ca = executable.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def time_program(fn, args, steps, fetch):
    out = None
    for _ in range(3):
        out = fn(*args)
    float(fetch(out))  # drain the one-time server-side program load
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(fetch(out))
    return (time.perf_counter() - t0) / steps


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.models.resnet import BasicBlock

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = int(os.environ.get("BENCH_SIZE", 256))
    dtype = jnp.bfloat16

    norm = partial(nn.BatchNorm, use_running_average=False, momentum=0.9,
                   epsilon=1e-5, dtype=dtype)
    conv = partial(nn.Conv, use_bias=False, dtype=dtype, padding="SAME")

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=dtype, name="conv_init")(x)
            return nn.relu(norm(name="bn_init")(y))

    class Pool(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    class Stage(nn.Module):
        filters: int
        first_stride: int

        @nn.compact
        def __call__(self, x):
            for j in range(2):  # resnet18: 2 BasicBlocks per stage
                strides = ((self.first_stride,) * 2 if j == 0 else (1, 1))
                x = BasicBlock(self.filters, strides=strides, conv=conv,
                               norm=norm, name=f"block{j}")(x)
            return x

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, y):
            import optax
            logits = nn.Dense(9, dtype=jnp.float32, name="fc")(
                jnp.mean(x, axis=(1, 2)))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    # segment: (module, input shape NHWC). Shapes are the bench config's
    # (batch 256, 256x256 input -> stem/2 -> pool/2 -> stages)
    s = size
    segments = [
        ("conv1", Stem(), (batch, s, s, 3)),
        ("pool", Pool(), (batch, s // 2, s // 2, 64)),
        ("layer1", Stage(64, 1), (batch, s // 4, s // 4, 64)),
        ("layer2", Stage(128, 2), (batch, s // 4, s // 4, 64)),
        ("layer3", Stage(256, 2), (batch, s // 8, s // 8, 128)),
        ("layer4", Stage(512, 2), (batch, s // 16, s // 16, 256)),
        ("head", Head(), (batch, s // 32, s // 32, 512)),
    ]

    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 9, size=(batch,)), jnp.int32)
    report = {}
    total = 0.0
    for name, mod, in_shape in segments:
        x = jnp.asarray(rng.normal(size=in_shape), jnp.float32)
        if name == "head":
            variables = jax.jit(mod.init)(jax.random.key(0), x, labels)
        else:
            variables = jax.jit(mod.init)(jax.random.key(0), x)
        params = variables.get("params", {})
        stats = {k: v for k, v in variables.items() if k != "params"}

        if name == "head":
            def loss_fn(params, x, cot, mod=mod, stats=stats):
                out = mod.apply({"params": params, **stats}, x, labels,
                                mutable=list(stats) or False)
                return (out[0] if stats else out) + 0.0 * jnp.sum(cot)
            cot = jnp.zeros((), jnp.float32)
        else:
            # fixed-cotangent scalarization: sum(out * cot) makes the
            # backward carry the same activation-sized cotangents the
            # full step does. The cotangent is an ARGUMENT, not a
            # closure constant — a closed-over (256,128,128,64) array
            # would be baked into the HLO and blow the remote-compile
            # request limit (HTTP 413, measured). eval_shape (no
            # compile) gets the output aval; eager probes would pay a
            # remote compile per op on this backend.
            out_shape = jax.eval_shape(
                lambda v, x: mod.apply(v, x, mutable=list(stats) or False),
                variables, x)
            out0 = out_shape[0] if stats else out_shape
            cot = jnp.asarray(rng.normal(size=out0.shape), out0.dtype)

            def loss_fn(params, x, cot, mod=mod, stats=stats):
                out = mod.apply({"params": params, **stats}, x,
                                mutable=list(stats) or False)
                o = out[0] if stats else out
                return jnp.sum(o.astype(jnp.float32)
                               * cot.astype(jnp.float32))

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
        args = (params, x, cot)
        flops, nbytes = cost(grad_fn.lower(*args).compile())
        dt = time_program(grad_fn, args, steps, lambda o: o[0])
        total += dt
        report[name] = {
            "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(nbytes / 1e9, 3),
            "mfu": round(flops / dt / PEAK_FLOPS, 4),
            "hbm_util": round(nbytes / dt / PEAK_BYTES, 4),
            "roofline_ms": round(max(flops / PEAK_FLOPS,
                                     nbytes / PEAK_BYTES) * 1e3, 3),
        }
        print(f"{name:7s} {json.dumps(report[name])}", flush=True)

    print(f"TOTAL   {total * 1e3:.2f} ms fwd+bwd standalone "
          f"(clf_grad measured ~45-48 ms in results/profile_step.json)")
    os.makedirs("results", exist_ok=True)
    with open("results/profile_clf_layers.json", "w") as fh:
        json.dump({"batch": batch, "size": size, "dtype": "bfloat16",
                   "segments": report,
                   "total_ms": round(total * 1e3, 3)}, fh, indent=2)


if __name__ == "__main__":
    main()
