#!/usr/bin/env python
"""Fused Pallas stem vs the XLA stem on the real chip (VERDICT r4 item
4): conv7x7/2 + train-mode BN + relu + maxpool3x3/2, forward and
fwd+bwd, at the bench shapes (batch 256, 256x256, bf16 compute).

The XLA baseline is the same segment the per-layer ledger attributed at
<=8.5% MFU / ~30.5 ms standalone fwd+bwd (results/profile_clf_layers.json
conv1+pool rows). Writes results/stem_pallas_micro.json.

Timing rules for this backend (see .claude/skills/verify/SKILL.md):
programs warm up through a device-to-host fetch (block_until_ready
returns early; first execution pays a ~4-min server-side load), the
cotangent is an argument (a closed-over activation-sized constant blows
the remote-compile payload limit).

Usage: python tools/stem_micro.py [batch] [steps]
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


def cost(executable):
    ca = executable.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.pallas.stem import stem_train

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = int(os.environ.get("BENCH_SIZE", 256))
    dtype = jnp.bfloat16

    class XlaStem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=dtype, name="conv_init")(x)
            y = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=dtype, name="bn_init")(y)
            y = nn.relu(y)
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(batch, size // 4, size // 4, 64)),
                      jnp.float32)

    mod = XlaStem()
    variables = jax.jit(mod.init)(jax.random.key(0), x)
    params = variables["params"]
    stats = variables["batch_stats"]
    w = params["conv_init"]["kernel"].astype(jnp.float32)
    gamma = params["bn_init"]["scale"].astype(jnp.float32)
    beta = params["bn_init"]["bias"].astype(jnp.float32)

    report = {"batch": batch, "size": size, "dtype": "bfloat16",
              "steps": steps}

    # ---- XLA fwd+bwd -----------------------------------------------------
    def xla_loss(params, x, cot):
        out, _ = mod.apply({"params": params, "batch_stats": stats}, x,
                           mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) * cot)

    xla_grad = jax.jit(jax.value_and_grad(xla_loss, argnums=(0, 1)))
    args = (params, x, cot)
    fl, by = cost(xla_grad.lower(*args).compile())
    dt = time_program(xla_grad, args, steps, lambda o: o[0])
    report["xla_fwd_bwd"] = {
        "ms": round(dt * 1e3, 3), "gflops": round(fl / 1e9, 2),
        "mfu": round(fl / dt / PEAK_FLOPS, 4),
        "hbm_util": round(by / dt / PEAK_BYTES, 4)}
    print("xla_fwd_bwd", json.dumps(report["xla_fwd_bwd"]), flush=True)

    # ---- XLA fwd ----------------------------------------------------------
    xla_fwd = jax.jit(lambda p, x: mod.apply(
        {"params": p, "batch_stats": stats}, x,
        mutable=["batch_stats"])[0])
    dt = time_program(xla_fwd, (params, x), steps,
                      lambda o: o[0, 0, 0, 0].astype(jnp.float32))
    report["xla_fwd"] = {"ms": round(dt * 1e3, 3)}
    print("xla_fwd", json.dumps(report["xla_fwd"]), flush=True)

    # ---- Pallas fwd+bwd ---------------------------------------------------
    def pl_loss(w, gamma, beta, x, cot):
        pooled, bm, bv = stem_train(x, w, gamma, beta, 1e-5, dtype, None)
        # carry the running-stat update like the flax segment does
        return (jnp.sum(pooled.astype(jnp.float32) * cot)
                + 0.0 * jnp.sum(bm) + 0.0 * jnp.sum(bv))

    pl_grad = jax.jit(jax.value_and_grad(pl_loss, argnums=(0, 1, 2, 3)))
    args = (w, gamma, beta, x, cot)
    fl2, by2 = cost(pl_grad.lower(*args).compile())
    dt = time_program(pl_grad, args, steps, lambda o: o[0])
    report["pallas_fwd_bwd"] = {
        "ms": round(dt * 1e3, 3),
        # MFU against the XLA segment's flop count: cost-analysis of a
        # pallas program reports the CostEstimate, not comparable work
        "mfu_vs_xla_flops": round(fl / dt / PEAK_FLOPS, 4)}
    print("pallas_fwd_bwd", json.dumps(report["pallas_fwd_bwd"]),
          flush=True)

    # ---- Pallas fwd --------------------------------------------------------
    pl_fwd = jax.jit(lambda w, g, b, x: stem_train(x, w, g, b, 1e-5,
                                                   dtype, None)[0])
    dt = time_program(pl_fwd, (w, gamma, beta, x), steps,
                      lambda o: o[0, 0, 0, 0].astype(jnp.float32))
    report["pallas_fwd"] = {"ms": round(dt * 1e3, 3)}
    print("pallas_fwd", json.dumps(report["pallas_fwd"]), flush=True)

    # ---- numeric sanity on-chip -------------------------------------------
    ref = xla_grad(params, x, cot)
    got = pl_grad(w, gamma, beta, x, cot)
    dwa = np.asarray(ref[1][0]["conv_init"]["kernel"], np.float32)
    dwb = np.asarray(got[1][0], np.float32)
    scale = np.abs(dwa).max() + 1e-8
    report["dw_max_reldiff"] = round(
        float(np.abs(dwa - dwb).max() / scale), 5)
    dxa = np.asarray(ref[1][1], np.float32)
    dxb = np.asarray(got[1][3], np.float32)
    report["dx_max_reldiff"] = round(
        float(np.abs(dxa - dxb).max() / (np.abs(dxa).max() + 1e-8)), 5)
    print("grad parity:", report["dw_max_reldiff"],
          report["dx_max_reldiff"], flush=True)

    speedup = (report["xla_fwd_bwd"]["ms"]
               / report["pallas_fwd_bwd"]["ms"])
    report["fwd_bwd_speedup"] = round(speedup, 3)
    print(f"fwd+bwd speedup: {speedup:.2f}x", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/stem_pallas_micro.json", "w") as fh:
        json.dump(report, fh, indent=2)
    print("-> results/stem_pallas_micro.json")


if __name__ == "__main__":
    main()
