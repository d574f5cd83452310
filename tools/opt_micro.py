#!/usr/bin/env python
"""Measure the opt_apply program variants on the real chip.

The staged step's optimizer program (training/core.py make_optimizer) has
two implementations — per-leaf optax chain vs one raveled flat vector —
and runs donated in the real step. Times all four (impl x donation)
combinations on ResNet-18-scale params so the default is chosen from
chip measurements, not rooflines.

Timing discipline per CLAUDE.md: warm past the one-time program load,
then time loops ended by a device-to-host fetch. Donated variants thread
(params, opt_state) through the loop like real training.

Usage: python tools/opt_micro.py [steps]
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
    import optax
    from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.models import resnet_model
    from raw2logit_tpu.training import TrainConfig, create_train_state
    from raw2logit_tpu.training.core import make_optimizer

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    processor = ParametrizedProcessing(
        camera_parameters=MICROSCOPY_CAMERA_PARAMS, image_size=256,
        use_pallas=True)
    classifier = resnet_model("resnet18", fc_out_features=9,
                              dtype=jnp.bfloat16)
    cfg = TrainConfig(task="classification", lr=1e-5)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(2, 256, 256)), jnp.float32)
    state, _ = create_train_state(cfg, processor, classifier, raw,
                                  jax.random.key(0))
    params = (state.proc_params, state.clf_params)
    # gradient stand-in with the right structure/dtypes
    grads = jax.tree_util.tree_map(lambda p: p * 1e-3, params)

    report = {}
    for flat in (False, True):
        tx = make_optimizer(cfg, state.proc_params, state.clf_params,
                            flat=flat)
        opt0 = jax.jit(tx.init)(params)

        def _apply(g, opt_state, p):
            updates, new_opt = tx.update(g, opt_state, p)
            return optax.apply_updates(p, updates), new_opt

        for donate in (False, True):
            fn = jax.jit(_apply,
                         donate_argnums=(1, 2) if donate else ())
            # fresh buffers for the donated loop
            p = jax.tree_util.tree_map(jnp.copy, params)
            o = jax.tree_util.tree_map(jnp.copy, opt0)
            for _ in range(3):
                p, o = fn(grads, o, p)
            float(jax.tree_util.tree_leaves(p)[0].ravel()[0])  # load drain
            t0 = time.perf_counter()
            for _ in range(steps):
                p, o = fn(grads, o, p)
            float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
            dt = (time.perf_counter() - t0) / steps
            key = f"flat={flat} donate={donate}"
            report[key] = round(dt * 1e3, 3)
            print(f"{key:24s} {dt * 1e3:.3f} ms", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/opt_micro.json", "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
