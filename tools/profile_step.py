#!/usr/bin/env python
"""Attribute the train step's time across the four staged programs on the
real chip, with XLA cost-analysis rooflines (flops vs bytes) per program.

The staged decomposition (training/core.py make_staged_train_step) gives
per-program timing without a trace viewer: isp_fwd / clf_grad / isp_bwd /
opt_apply are the whole monolithic step (VERDICT r3 item 1 attribution).

Timing discipline for this backend (CLAUDE.md): warm each program past
its one-time server-side load, then time loops ended by a device-to-host
value fetch — block_until_ready returns early here.

Usage: python tools/profile_step.py [batch] [steps]
       PROFILE_TASK=segmentation python tools/profile_step.py 64 10
         (drone car-seg config: parametrized ISP -> U-Net++ -> Dice)
       PROFILE_TASK=neural python tools/profile_step.py 64 10
         (neural_network mode: NNProcessing -> ResNet18 -> CE)
       PROFILE_TASK=adversarial python tools/profile_step.py 256 20
         (drift forensics: frozen classifier, SSIM aux; adds the
          isp_fwd_ref and aux_grad rows)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
PEAK_BYTES = float(os.environ.get("BENCH_PEAK_BYTES", 819e9))  # v5e HBM


def cost(executable):
    ca = executable.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def time_program(fn, args, steps, fetch):
    """Warm (ending with a true D2H barrier), then time `steps` calls."""
    out = None
    for _ in range(3):
        out = fn(*args)
    float(fetch(out))  # drain the one-time program load
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(fetch(out))
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.data.datasets import (DRONE_CAMERA_PARAMS,
                                             MICROSCOPY_CAMERA_PARAMS)
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.models import UNetPlusPlus, resnet_model
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_staged_train_step)

    task = os.environ.get("PROFILE_TASK", "classification")
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (
        256 if task in ("classification", "adversarial") else 64)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = int(os.environ.get("BENCH_SIZE", 256))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)
    out_tag = task
    if task == "segmentation":
        # reference drone car-seg config (train.py:218-237)
        processor = ParametrizedProcessing(
            camera_parameters=DRONE_CAMERA_PARAMS, image_size=size,
            use_pallas=os.environ.get("BENCH_ISP", "pallas") == "pallas")
        classifier = UNetPlusPlus(
            encoder_name="resnet34", encoder_depth=5,
            decoder_channels=(256, 128, 64, 32, 16), in_channels=3,
            classes=1, dtype=jnp.bfloat16)
        y = jnp.asarray(rng.integers(0, 2, size=(batch, size, size)),
                        jnp.float32)
    elif task == "neural":
        from raw2logit_tpu.isp import NNProcessing
        processor = NNProcessing(normalize_mosaic_mean=(0.5, 0.5, 0.5),
                                 normalize_mosaic_std=(0.25, 0.25, 0.25))
        classifier = resnet_model("resnet18", fc_out_features=9,
                                  dtype=jnp.bfloat16)
        y = jnp.asarray(rng.integers(0, 9, size=(batch,)), jnp.int32)
        task = "classification"  # TrainConfig task; out_tag keeps the
        #                          processor-family name for the report
    else:
        processor = ParametrizedProcessing(
            camera_parameters=MICROSCOPY_CAMERA_PARAMS, image_size=size,
            use_pallas=os.environ.get("BENCH_ISP", "pallas") == "pallas")
        classifier = resnet_model("resnet18", fc_out_features=9,
                                  dtype=jnp.bfloat16)
        y = jnp.asarray(rng.integers(0, 9, size=(batch,)), jnp.int32)
    if task == "adversarial":
        # drift-forensics setup (train.py:241-273, tools/adv_micro.py)
        cfg = TrainConfig(task="classification", lr=1e-3,
                          adv_training=True, loss_weight=-1.0,
                          adv_aux_loss="ssim", adv_aux_weight=0.3,
                          freeze_classifier=True)
        task = "classification"
        out_tag = "adversarial"
    else:
        cfg = TrainConfig(task=task, lr=1e-5)
    # PROFILE_FUSE_OPT=1: per-module Adam applies folded into the two
    # gradient programs (no opt_apply row)
    fuse_opt = os.environ.get("PROFILE_FUSE_OPT", "0") == "1"
    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0), split_opt=fuse_opt)
    step = make_staged_train_step(cfg, processor, classifier, tx,
                                  donate=False, fuse_opt=fuse_opt)
    key = jax.random.key(1)

    # materialize the intermediate tensors each program needs; the fast
    # Pallas staged path (training/core.py) has wider isp signatures
    fwd_out = step.programs["isp_fwd"](state.proc_params, state.proc_stats,
                                       raw)
    fast = len(fwd_out) >= 3
    if len(fwd_out) == 3:       # bn_in_clf planar boundary: (pre, stats, res)
        rgb, _, res = fwd_out
        pre = rgb
    elif fast:
        rgb, _, pre, res = fwd_out
    else:
        rgb, _ = fwd_out
    bn_in_clf = ("clf_grad_bn" in step.programs
                 and "batch_norm" in state.proc_stats)
    clf_tail = (state.opt_state[1],) if fuse_opt else ()
    if bn_in_clf:
        clf_prog = step.programs["clf_grad_bn"]
        clf_args = (state.clf_params, state.clf_stats, pre,
                    state.proc_stats["batch_norm"], y, key) + clf_tail
        out = clf_prog(*clf_args)
        d_rgb, mets = out[2 if fuse_opt else 1], out[-1]
        clf_g = out[0]  # grads (plain) or updated params (fused; unused)
    else:
        clf_prog = step.programs["clf_grad"]
        clf_args = (state.clf_params, state.clf_stats, rgb, y,
                    key) + clf_tail
        out = clf_prog(*clf_args)
        d_rgb, mets = out[2 if fuse_opt else 1], out[-1]
        clf_g = out[0]
    if fast:
        bwd_args = (state.proc_params, state.proc_stats, raw, pre, res,
                    d_rgb)
    else:
        bwd_args = (state.proc_params, state.proc_stats, raw, d_rgb)
    if fuse_opt:
        bwd_args = bwd_args + (state.opt_state[0],)
    proc_g = step.programs["isp_bwd"](*bwd_args)
    float(mets["loss"])  # barrier

    progs = {
        "isp_fwd": (step.programs["isp_fwd"],
                    (state.proc_params, state.proc_stats, raw),
                    lambda o: o[0][0, 0, 0, 0] if o[0].ndim == 4
                    else o[0][0, 0, 0]),
        "clf_grad": (clf_prog, clf_args,
                     lambda o: o[-1]["loss"]),
        "isp_bwd": (step.programs["isp_bwd"], bwd_args,
                    lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0]),
    }
    if "aux_grad" in step.programs:
        # adversarial extras: the frozen default-processor forward (the
        # same compiled isp_fwd program on the ref params) and the SSIM/l2
        # aux value + rgb-cotangent program
        ref_args = (state.ref_proc_params, state.ref_proc_stats, raw)
        ref_rgb = step.programs["isp_fwd"](*ref_args)[0]
        progs["isp_fwd_ref"] = (
            step.programs["isp_fwd"], ref_args,
            lambda o: o[0][0, 0, 0, 0] if o[0].ndim == 4 else o[0][0, 0, 0])
        progs["aux_grad"] = (
            step.programs["aux_grad"],
            (ref_rgb, rgb, d_rgb, mets["loss"]),
            lambda o: o[0])
    if not fuse_opt:
        progs["opt_apply"] = (
            step.programs["opt_apply"],
            ((proc_g, clf_g), state.opt_state,
             (state.proc_params, state.clf_params)),
            lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0])

    total = 0.0
    report = {}
    for name, (fn, args, fetch) in progs.items():
        flops, nbytes = cost(fn.lower(*args).compile())
        dt = time_program(fn, args, steps, fetch)
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
        print(f"{name:9s} {json.dumps(report[name])}", flush=True)

    print(f"TOTAL     {total * 1e3:.2f} ms  "
          f"({batch / total:.0f} imgs/s at batch {batch})")
    os.makedirs("results", exist_ok=True)
    out_path = {"segmentation": "results/profile_step_seg.json",
                "neural": "results/profile_step_neural.json",
                "adversarial": "results/profile_step_adv.json"}.get(
                    out_tag, "results/profile_step.json")
    with open(out_path, "w") as fh:
        json.dump({"task": out_tag, "batch": batch, "size": size,
                   "programs": report,
                   "total_ms": round(total * 1e3, 3)}, fh, indent=2)


if __name__ == "__main__":
    main()
