#!/usr/bin/env python
"""Measure the ADVERSARIAL (drift-forensics) train step on the real chip
(VERDICT r2 item 1/2: the forensics axis had only ever run on the CPU
mesh). Uses the staged step — adv mode is one extra small program
(aux_grad) plus a second use of the cached isp_fwd program for the frozen
default processor (training/core.py).

Usage: python tools/adv_micro.py [batch] [steps]
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
    from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.models import resnet_model
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_staged_train_step)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    size = 256

    processor = ParametrizedProcessing(
        camera_parameters=MICROSCOPY_CAMERA_PARAMS, image_size=size,
        use_pallas=True)
    classifier = resnet_model("resnet18", fc_out_features=9,
                              dtype=jnp.bfloat16)
    # the reference's drift-forensics setup (train.py:241-273): maximize
    # task loss over ISP params, classifier frozen, SSIM aux toward the
    # frozen default pipeline
    cfg = TrainConfig(task="classification", lr=1e-3, adv_training=True,
                      loss_weight=-1.0, adv_aux_loss="ssim",
                      adv_aux_weight=0.3, freeze_classifier=True)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 9, size=(batch,)), jnp.int32)
    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0))
    step = make_staged_train_step(cfg, processor, classifier, tx,
                                  donate=False)
    key = jax.random.key(1)

    s = state
    for i in range(3):
        s, mets = step(s, raw, y, jax.random.fold_in(key, i))
    assert np.isfinite(float(mets["loss"]))  # true D2H barrier
    t0 = time.perf_counter()
    for i in range(steps):
        s, mets = step(s, raw, y, jax.random.fold_in(key, 100 + i))
    loss = float(mets["loss"])
    dt = (time.perf_counter() - t0) / steps

    # the adversarial objective actually moved the ISP (gamma drifts)
    moved = float(jnp.abs(s.proc_params["gamma_correct"]
                          - state.proc_params["gamma_correct"]).max())
    result = {"mode": "adv_train_staged", "batch": batch,
              "step_ms": round(dt * 1e3, 3),
              "imgs_per_sec": round(batch / dt, 2),
              "loss": round(loss, 4),
              "loss_aux": round(float(mets["loss_aux"]), 4),
              "gamma_moved": moved}
    print(json.dumps(result))
    os.makedirs("results", exist_ok=True)
    with open("results/adv_step_tpu.json", "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
