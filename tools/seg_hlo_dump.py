#!/usr/bin/env python
"""Dump the optimized HLO of the segmentation clf_grad program (cached
compile) and tally logical bytes per instruction, attributing the measured
188.8 GB of HBM traffic (results/profile_step_seg.json) to specific ops.

Usage: python tools/seg_hlo_dump.py [batch]   (TPU client; compile cached)
"""

import os
import sys

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
    size = 256
    processor = ParametrizedProcessing(
        camera_parameters=DRONE_CAMERA_PARAMS, image_size=size,
        use_pallas=True)
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
    fwd_out = step.programs["isp_fwd"](state.proc_params, state.proc_stats,
                                       raw)
    if "clf_grad_bn" in step.programs:
        clf = step.programs["clf_grad_bn"]
        args = (state.clf_params, state.clf_stats, fwd_out[0],
                state.proc_stats["batch_norm"], y, key)
    else:
        clf = step.programs["clf_grad"]
        args = (state.clf_params, state.clf_stats, fwd_out[0], y, key)
    txt = clf.lower(*args).compile().as_text()
    out = f"/tmp/seg_clf_grad_b{batch}.hlo"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"wrote {out} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
