#!/usr/bin/env python
"""Drift optimization in miniature (offline, synthetic): compare a frozen
default ISP against a jointly-trained ISP + classifier — the reference's
third experiment family (README.md:120-139: joint training makes data
generation help the task model).

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python examples/drift_optimization.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def _final_val_loss(results):
    metrics = results[0]["run"].read_metrics()
    return [m["val_loss"] for m in metrics if "val_loss" in m]


def main():
    from raw2logit_tpu.training.train import build_parser, run_train

    common = ["--dataset", "SyntheticMicroscopy", "--processing_mode",
              "parametrized", "--epochs", "4", "--batch_size", "8",
              "--n_splits", "1", "--lr", "1e-3",
              "--experiment_name", "drift_opt"]

    frozen = run_train(build_parser().parse_args(
        common + ["--freeze_processor", "--run_name", "frozen_isp"]))
    joint = run_train(build_parser().parse_args(
        common + ["--run_name", "joint_isp"]))

    lf = _final_val_loss(frozen)
    lj = _final_val_loss(joint)
    print(f"frozen-ISP val loss per epoch:  {[round(v, 4) for v in lf]}")
    print(f"joint-ISP  val loss per epoch:  {[round(v, 4) for v in lj]}")
    print(f"final: frozen {lf[-1]:.4f} vs joint {lj[-1]:.4f} "
          f"({'joint better' if lj[-1] < lf[-1] else 'frozen better'})")


if __name__ == "__main__":
    main()
