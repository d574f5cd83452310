#!/usr/bin/env python
"""Cost-analysis (flops/bytes) of the segmentation staged programs on the
CPU backend — no TPU needed; HLO-level flops are backend-independent, and
bytes-accessed is indicative. Compares against the v5e rooflines to decide
whether the measured step time (results/seg_step_tpu.json) is near its
floor before spending chip time.

Run under the CPU env (see run_tests.sh):
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python tools/seg_cost_analysis.py [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
PEAK_BYTES = float(os.environ.get("BENCH_PEAK_BYTES", 819e9))


def cost(fn, *args):
    ex = fn.lower(*args).compile()
    ca = ex.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.data.datasets import DRONE_CAMERA_PARAMS
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.models import UNetPlusPlus
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_staged_train_step)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = 256

    processor = ParametrizedProcessing(
        camera_parameters=DRONE_CAMERA_PARAMS, image_size=size,
        use_pallas=False)  # CPU: no Mosaic; jnp path has the same model cost
    classifier = UNetPlusPlus(encoder_name="resnet34", encoder_depth=5,
                              decoder_channels=(256, 128, 64, 32, 16),
                              in_channels=3, classes=1, dtype=jnp.bfloat16)
    cfg = TrainConfig(task="segmentation", lr=1e-5)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=(batch, size, size)),
                    jnp.float32)
    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0))
    step = make_staged_train_step(cfg, processor, classifier, tx,
                                  donate=False)
    key = jax.random.key(1)

    # classifier value-and-grad program (the whale)
    fwd_out = step.programs["isp_fwd"](state.proc_params, state.proc_stats,
                                       raw)
    names = list(step.programs)
    print("programs:", names)
    report = {}

    if "clf_grad_bn" in step.programs:
        rgb_like = fwd_out[0]
        clf = step.programs["clf_grad_bn"]
        clf_args = (state.clf_params, state.clf_stats, rgb_like,
                    state.proc_stats["batch_norm"], y, key)
    else:
        clf = step.programs["clf_grad"]
        clf_args = (state.clf_params, state.clf_stats, fwd_out[0], y, key)
    f, b = cost(clf, *clf_args)
    report["clf_grad"] = (f, b)

    # U-Net++ forward alone (eval), for the inference metric
    pvars = {"params": state.proc_params, "batch_stats": state.proc_stats}
    cvars = {"params": state.clf_params, "batch_stats": state.clf_stats}
    rgb, _ = processor.apply(pvars, raw, train=False)

    @jax.jit
    def fwd(rgb):
        return classifier.apply(cvars, rgb, train=False)

    f, b = cost(fwd, rgb)
    report["unetpp_fwd"] = (f, b)

    out = {}
    for name, (f, b) in report.items():
        out[name] = {
            "gflops": round(f / 1e9, 2),
            "gbytes": round(b / 1e9, 3),
            "compute_roofline_ms": round(f / PEAK_FLOPS * 1e3, 3),
            "hbm_roofline_ms": round(b / PEAK_BYTES * 1e3, 3),
        }
        print(name, json.dumps(out[name]))
    with open("results/seg_cost_analysis.json", "w") as fh:
        json.dump({"batch": batch, "size": size, **out}, fh, indent=2)


if __name__ == "__main__":
    main()
