#!/usr/bin/env python
"""End-to-end drift-synthesis cycle on synthetic data (small, offline).

Reproduces the reference's experiment loop (figures/train.sh ->
figures/ABtesting.py) in miniature:
  1. train a classifier per static ISP pipeline (subset of the 12-grid)
  2. evaluate every (train-pipeline, test-pipeline) pair -> A/B table
  3. render the accuracy heatmap

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python examples/drift_cycle.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


DEFAULT_PIPELINES = [
    ("bilinear", "sharpening_filter", "gaussian_denoising"),
    ("malvar2004", "unsharp_masking", "median_denoising"),
]


def run_cycle(train_pipelines=None, epochs=2, batch_size=8,
              table_path="results/ABtesting/tables/ABtable_drift_cycle.json"):
    from raw2logit_tpu.evaluation.abtesting import (ABTesting, ab_show_table,
                                                    pipeline_name)
    from raw2logit_tpu.training.train import build_parser, run_train

    train_pipelines = train_pipelines or DEFAULT_PIPELINES

    checkpoints = {}
    valid_indices = None
    for (db, sh, dn) in train_pipelines:
        name = pipeline_name(db, sh, dn)
        argv = ["--dataset", "SyntheticMicroscopy",
                "--processing_mode", "static",
                "--sp_debayer", db, "--sp_sharpening", sh,
                "--sp_denoising", dn,
                "--epochs", str(epochs), "--batch_size", str(batch_size),
                "--n_splits", "1", "--lr", "1e-3",
                "--experiment_name", "drift_cycle",
                "--run_name", name]
        results = run_train(build_parser().parse_args(argv))
        run = results[0]["run"]
        checkpoints[name] = os.path.join(run.dir, "checkpoints",
                                         "classifier")
        valid_indices = results[0]["valid_indices"]

    ab = ABTesting("SyntheticMicroscopy", batch_size=batch_size)
    table = ab.ab_make_table(checkpoints, valid_indices, table_path,
                             test_grid=train_pipelines)
    png = ab_show_table(table_path, metric="accuracy")
    print(f"table -> {table_path}")
    print(f"heatmap -> {png}")

    # drift-synthesis signal: on-diagonal (matched pipeline) accuracy should
    # not be lower than off-diagonal ('_meta' holds the config fingerprint)
    diag, off = [], []
    for k, v in table.items():
        if "__VS__" not in k:
            continue
        a, b = k.split("__VS__")
        (diag if a == b else off).append(v["accuracy_mean"])
    summary = {"matched_acc": sum(diag) / len(diag),
               "swapped_acc": (sum(off) / len(off)) if off else None,
               "table_path": table_path, "heatmap": png}
    print(f"matched-pipeline acc: {summary['matched_acc']:.3f}, "
          f"swapped-pipeline acc: {summary['swapped_acc']}")
    return summary


def main():
    run_cycle()


if __name__ == "__main__":
    main()
