#!/usr/bin/env python
"""Measure the NEURAL-ISP (processing_mode=neural_network) train step on
the real chip.

The reference's third processor family (pipeline_torch.py:83-126:
NNProcessing, U-Net++ resnet34 encoder depth 3 on the half-resolution
packed mosaic) has so far only been exercised on the CPU mesh; this
drives the staged raw->logit step — NNProcessing -> ResNet18 -> CE —
on the TPU through the generic (non-Pallas) staged path, plus matching
inference. The classifier sees 128x128 RGB (reduce_size packing halves
the mosaic, reference pipeline_torch.py:43-80).

Usage: python tools/nn_isp_micro.py [batch] [steps]
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
    from raw2logit_tpu.isp import NNProcessing
    from raw2logit_tpu.models import resnet_model
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_staged_train_step)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = 256

    # reference neural_network mode: mosaic-normalized NNProcessing
    # (train.py:187-200) -> resnet18 classifier
    # NN_REMAT=1: rematerialize the U-Net++ decoder grid nodes (exact)
    processor = NNProcessing(normalize_mosaic_mean=(0.5, 0.5, 0.5),
                             normalize_mosaic_std=(0.25, 0.25, 0.25),
                             remat=os.environ.get("NN_REMAT", "0") == "1")
    classifier = resnet_model("resnet18", fc_out_features=9,
                              dtype=jnp.bfloat16)
    cfg = TrainConfig(task="classification", lr=1e-5)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 9, size=(batch,)), jnp.int32)
    # NN_MONOLITH=1: one jitted program instead of the staged split. The
    # staged isp_bwd RECOMPUTES the U-Net++ ISP forward inside its vjp
    # (+1.55 TFLOP of the step's 6.4, results/profile_step_neural.json);
    # the monolith keeps the forward's activations instead.
    monolith = os.environ.get("NN_MONOLITH", "0") == "1"
    # NN_RESIDUALS=1: staged split WITHOUT the recompute — the ISP vjp
    # residuals cross the program boundary (make_staged_train_step
    # isp_residuals=True)
    residuals = os.environ.get("NN_RESIDUALS", "0") == "1"
    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0))
    if monolith:
        from raw2logit_tpu.training import make_train_step
        step = make_train_step(cfg, processor, classifier, tx,
                               donate=True)
    else:
        step = make_staged_train_step(cfg, processor, classifier, tx,
                                      donate=True,
                                      isp_residuals=residuals)
    key = jax.random.key(1)

    s = state
    for i in range(3):
        s, mets = step(s, raw, y, jax.random.fold_in(key, i))
    assert np.isfinite(float(mets["loss"]))  # true D2H barrier
    t0 = time.perf_counter()
    for i in range(steps):
        s, mets = step(s, raw, y, jax.random.fold_in(key, 100 + i))
    loss = float(mets["loss"])  # D2H fetch closes the timed region
    train_dt = (time.perf_counter() - t0) / steps

    pvars = {"params": s.proc_params, "batch_stats": s.proc_stats}
    cvars = {"params": s.clf_params, "batch_stats": s.clf_stats}

    @jax.jit
    def fwd(raw):
        rgb, _ = processor.apply(pvars, raw, train=False)
        return classifier.apply(cvars, rgb, train=False)

    for _ in range(3):
        out = fwd(raw)
    assert np.isfinite(float(out[0, 0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(raw)
    assert np.isfinite(float(out[0, 0]))
    infer_dt = (time.perf_counter() - t0) / steps

    mode = ("nn_isp_train_monolith" if monolith else
            "nn_isp_train_staged_res" if residuals else
            "nn_isp_train_staged")
    result = {"mode": mode,
              "batch": batch,
              "train_step_ms": round(train_dt * 1e3, 3),
              "train_imgs_per_sec": round(batch / train_dt, 2),
              "infer_step_ms": round(infer_dt * 1e3, 3),
              "infer_imgs_per_sec": round(batch / infer_dt, 2),
              "loss": round(loss, 4),
              "accuracy": round(float(mets["accuracy"]), 4)}
    # vs the measured torch-CPU neural-ISP baselines, when already cached
    # (benchmarks/torch_baseline.py; measuring them claims no TPU)
    for key, path in (("train", "results/torch_baseline_nn.json"),
                      ("infer", "results/torch_baseline_nn_infer.json")):
        if os.path.exists(path):
            with open(path) as fh:
                base = json.load(fh)
            base_v = base.get("train_imgs_per_sec", base.get("imgs_per_sec"))
            result[f"{key}_vs_torch_cpu"] = round(
                result[f"{key}_imgs_per_sec"] / base_v, 2)
    print(json.dumps(result))
    os.makedirs("results", exist_ok=True)
    path = ("results/nn_isp_step_tpu_monolith.json" if monolith else
            "results/nn_isp_step_tpu_res.json" if residuals else
            "results/nn_isp_step_tpu.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
