#!/usr/bin/env python
"""A/B + corruption evaluation CLI (same mode surface as the reference
figures/ABtesting.py:21-63).

Modes:
  ABMakeTable | ABShowTable | ABShowImages | ABShowAllImages |
  CMakeTable  | CShowTable  | CShowImages  | CShowAllImages
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()


def build_parser():
    p = argparse.ArgumentParser(description="AB testing")
    p.add_argument("--mode", required=True,
                   choices=["ABMakeTable", "ABShowTable", "ABShowImages",
                            "ABShowAllImages", "CMakeTable", "CShowTable",
                            "CShowImages", "CShowAllImages"])
    p.add_argument("--dataset_name", default="Microscopy")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--checkpoints_json", default=None,
                   help="json mapping train-pipeline name -> checkpoint path")
    p.add_argument("--state_dict", default=None,
                   help="state_dict.json with valid_indices (fold parity)")
    p.add_argument("--augmentation", default="weak")
    p.add_argument("--N_runs", type=int, default=5)
    p.add_argument("--severity", type=int, default=1)
    p.add_argument("--out_dir", default="results/ABtesting")
    p.add_argument("--metric", default="accuracy")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from raw2logit_tpu.evaluation.abtesting import (ABTesting, ab_show_table,
                                                    pipeline_grid,
                                                    pipeline_name)

    os.makedirs(args.out_dir, exist_ok=True)
    table_path = os.path.join(
        args.out_dir, "tables",
        f"{'AB' if args.mode.startswith('AB') else 'C'}table_"
        f"{args.dataset_name}_{args.augmentation}.json")

    if args.mode == "ABShowTable":
        out = ab_show_table(table_path, metric=args.metric)
        print(f"wrote {out}")
        return
    if args.mode == "CShowTable":
        from raw2logit_tpu.evaluation.abtesting import c_show_table
        out = c_show_table(table_path, metric=args.metric)
        print(f"wrote {out}")
        return

    checkpoints = {}
    if args.mode in ("ABMakeTable", "CMakeTable"):
        assert args.checkpoints_json, "--checkpoints_json required"
        with open(args.checkpoints_json) as fh:
            checkpoints = json.load(fh)
    valid_indices = None
    if args.state_dict:
        with open(args.state_dict) as fh:
            valid_indices = json.load(fh)["valid_indices"]

    ab = ABTesting(args.dataset_name, batch_size=args.batch_size,
                   severity=args.severity)
    if valid_indices is None:
        valid_indices = list(range(len(ab.dataset)))

    if args.mode == "ABMakeTable":
        ab.ab_make_table(checkpoints, valid_indices, table_path)
    elif args.mode == "CMakeTable":
        ab.c_make_table(checkpoints, valid_indices, table_path)
    elif args.mode in ("ABShowImages", "ABShowAllImages", "CShowImages",
                       "CShowAllImages"):
        _show_images(args, ab, valid_indices)
    print(f"done: {args.mode}")


def _show_images(args, ab, valid_indices):
    """Example processed tiles for each test pipeline (and severity), the
    ABShowImages/CShowImages visual diff (ABtesting.py:274-335)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.evaluation.abtesting import pipeline_grid, pipeline_name
    from raw2logit_tpu.evaluation.abtesting import CORRUPTION_LIST
    from raw2logit_tpu.evaluation.corruptions import distort
    from raw2logit_tpu.isp import StaticPipeline
    from raw2logit_tpu.tracking.images import save_image_grid

    raw = jnp.asarray(np.stack([ab.dataset[i][0]
                                for i in valid_indices[:8]]))
    out_dir = os.path.join(args.out_dir, "images", args.dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    for (db, sh, dn) in pipeline_grid():
        pipe = StaticPipeline(camera_parameters=ab.dataset.camera_parameters,
                              debayer=db, sharpening=sh, denoising=dn)
        rgb = pipe(raw)
        name = pipeline_name(db, sh, dn)
        if args.mode.startswith("C"):
            for corr in (CORRUPTION_LIST if "All" in args.mode
                         else ["gaussian_noise"]):
                out = distort(jax.random.key(0), rgb, corr, args.severity)
                save_image_grid(np.asarray(out), os.path.join(
                    out_dir, f"{name}_{corr}_s{args.severity}.png"))
        else:
            save_image_grid(np.asarray(rgb),
                            os.path.join(out_dir, f"{name}.png"))
        if "All" not in args.mode:
            break


if __name__ == "__main__":
    main()
