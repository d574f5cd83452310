#!/usr/bin/env python
"""Measure the SEGMENTATION (drone car-seg) train step on the real chip.

The reference's segmentation task (train.py:218-237: smp.UnetPlusPlus,
resnet34 encoder, depth 5, Dice loss) has so far only been measured on the
CPU mesh; this drives the staged raw->logit train step — parametrized ISP
(drone camera params) -> U-Net++ -> Dice — on the TPU, plus the matching
inference step.

Usage: python tools/seg_micro.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


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
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = 256

    processor = ParametrizedProcessing(
        camera_parameters=DRONE_CAMERA_PARAMS, image_size=size,
        use_pallas=True)
    # reference drone setup: smp.UnetPlusPlus(resnet34, depth 5,
    # decoder (256,128,64,32,16), 1 class) + Dice (train.py:218-237)
    # SEG_REMAT=1: rematerialize the decoder grid nodes (exact; trades
    # recompute at the step's 11% MFU for saved-activation HBM traffic)
    # SEG_LANE_PAD=1: lane-dense decoder variant (VERDICT r4 item 5) —
    # the HLO tally (results/seg_hlo_tally.json) attributes the 11% MFU
    # to C_out=16/32 lane under-occupancy + layout bytes; widening the
    # narrow rows to the bf16 lane width (256,128,128,64,64) measures
    # whether occupancy, not bytes, is the binding constraint. A
    # DIFFERENT model (more params), so results are reported separately.
    lane_pad = os.environ.get("SEG_LANE_PAD", "0") == "1"
    dec = (256, 128, 128, 64, 64) if lane_pad else (256, 128, 64, 32, 16)
    classifier = UNetPlusPlus(encoder_name="resnet34", encoder_depth=5,
                              decoder_channels=dec,
                              in_channels=3, classes=1, dtype=jnp.bfloat16,
                              remat=os.environ.get("SEG_REMAT", "0") == "1")
    cfg = TrainConfig(task="segmentation", lr=1e-5)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=(batch, size, size)),
                    jnp.float32)
    # SEG_FUSE_OPT=1: per-module Adam applies folded into the gradient
    # programs (no standalone opt_apply; it measured 8.7 ms at 27% HBM
    # util for the ~500-leaf U-Net++ tree, results/profile_step_seg.json)
    fuse_opt = os.environ.get("SEG_FUSE_OPT", "0") == "1"
    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0), split_opt=fuse_opt)
    step = make_staged_train_step(cfg, processor, classifier, tx,
                                  donate=True, fuse_opt=fuse_opt)
    key = jax.random.key(1)

    s = state
    for i in range(3):
        s, mets = step(s, raw, y, jax.random.fold_in(key, i))
    assert np.isfinite(float(mets["loss"]))  # true D2H barrier
    t0 = time.perf_counter()
    for i in range(steps):
        s, mets = step(s, raw, y, jax.random.fold_in(key, 100 + i))
    loss = float(mets["loss"])
    train_dt = (time.perf_counter() - t0) / steps

    # inference: ISP + U-Net++ forward (eval mode)
    pvars = {"params": s.proc_params, "batch_stats": s.proc_stats}
    cvars = {"params": s.clf_params, "batch_stats": s.clf_stats}

    @jax.jit
    def fwd(raw):
        rgb, _ = processor.apply(pvars, raw, train=False)
        return classifier.apply(cvars, rgb, train=False)

    for _ in range(3):
        out = fwd(raw)
    assert np.isfinite(float(out[0, 0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(raw)
    assert np.isfinite(float(out[0, 0, 0, 0]))
    infer_dt = (time.perf_counter() - t0) / steps

    result = {"mode": "seg_train_staged", "batch": batch,
              "fuse_opt": fuse_opt, "decoder_channels": list(dec),
              "train_step_ms": round(train_dt * 1e3, 3),
              "train_imgs_per_sec": round(batch / train_dt, 2),
              "infer_step_ms": round(infer_dt * 1e3, 3),
              "infer_imgs_per_sec": round(batch / infer_dt, 2),
              "loss": round(loss, 4),
              "iou_score": round(float(mets["iou_score"]), 4)}
    # vs the measured torch-CPU seg baselines, when already cached
    # (benchmarks/torch_baseline.py; measuring them claims no TPU)
    for key, path in (("train", "results/torch_baseline_seg.json"),
                      ("infer", "results/torch_baseline_seg_infer.json")):
        if os.path.exists(path):
            with open(path) as fh:
                base = json.load(fh)
            base_v = base.get("train_imgs_per_sec", base.get("imgs_per_sec"))
            result[f"{key}_vs_torch_cpu"] = round(
                result[f"{key}_imgs_per_sec"] / base_v, 2)
    print(json.dumps(result))
    os.makedirs("results", exist_ok=True)
    path = ("results/seg_step_tpu_lanepad.json" if lane_pad
            else "results/seg_step_tpu_fuse_opt.json" if fuse_opt
            else "results/seg_step_tpu.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
