#!/usr/bin/env python
"""A/B + corruption evaluation CLI (same mode surface as the reference
figures/ABtesting.py:21-63).

Modes:
  ABMakeTable | ABShowTable | ABShowImages | ABShowAllImages |
  CMakeTable  | CShowTable  | CShowImages  | CShowAllImages

ABMakeTable/CMakeTable aggregate over fold checkpoints (mean/sample-std,
honoring --N_runs); ABShowImages/CShowImages load a trained checkpoint and
render the model-involved panels (image pair, per-channel diffs, predicted
masks / prediction flip). The *ShowAllImages modes are the reference's
static galleries (no model, ABtesting.py:337-369,395-427).
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
                   help="json mapping train-pipeline name -> checkpoint "
                        "path or list of per-fold checkpoint paths")
    p.add_argument("--state_dict", default=None,
                   help="state_dict.json with valid_indices; pass a comma-"
                        "separated list for per-fold indices (fold parity)")
    p.add_argument("--augmentation", default="weak")
    p.add_argument("--N_runs", type=int, default=5)
    p.add_argument("--severities", type=int, nargs="+",
                   default=[1, 2, 3, 4, 5],
                   help="severity levels for CMakeTable")
    p.add_argument("--severity", type=int, default=1,
                   choices=(1, 2, 3, 4, 5))
    p.add_argument("--out_dir", default="results/ABtesting")
    p.add_argument("--metric", default="accuracy")
    p.add_argument("--download_model", action="store_true",
                   help="accepted for reference-CLI compatibility "
                        "(ABtesting.py:42); checkpoints load from the "
                        "local manifest, nothing to download")
    p.add_argument("--network", default="resnet18")
    # pipeline selection for the Show-Images modes (reference flag names)
    p.add_argument("--dm_train", default="bilinear",
                   choices=("bilinear", "malvar2004", "menon2007"))
    p.add_argument("--s_train", default="sharpening_filter",
                   choices=("sharpening_filter", "unsharp_masking"))
    p.add_argument("--dn_train", default="gaussian_denoising",
                   choices=("gaussian_denoising", "median_denoising"))
    p.add_argument("--dm_test", default="bilinear",
                   choices=("bilinear", "malvar2004", "menon2007"))
    p.add_argument("--s_test", default="sharpening_filter",
                   choices=("sharpening_filter", "unsharp_masking"))
    p.add_argument("--dn_test", default="gaussian_denoising",
                   choices=("gaussian_denoising", "median_denoising"))
    p.add_argument("--transform", default="identity",
                   help="corruption for CShowImages")
    return p


def _load_valid_indices(args, ab):
    if not args.state_dict:
        return list(range(len(ab.dataset)))
    paths = args.state_dict.split(",")
    per_fold = []
    for path in paths:
        with open(path) as fh:
            per_fold.append(json.load(fh)["valid_indices"])
    return per_fold if len(per_fold) > 1 else per_fold[0]


def main(argv=None):
    args = build_parser().parse_args(argv)
    from raw2logit_tpu.evaluation.abtesting import (ABTesting, ab_show_table,
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
    if args.mode in ("ABMakeTable", "CMakeTable", "ABShowImages",
                     "CShowImages"):
        assert args.checkpoints_json, "--checkpoints_json required"
        with open(args.checkpoints_json) as fh:
            checkpoints = json.load(fh)
        if "jobs" in checkpoints and "checkpoints" in checkpoints:
            # a sweep manifest (training/sweep.py): use its flat
            # pipeline->checkpoints map, and its per-fold state dicts for
            # the fold-reproducible valid indices unless --state_dict
            # overrides (every sweep run shares the k-fold seed, so any
            # pipeline's folds carry the same index split)
            manifest = checkpoints
            checkpoints = manifest["checkpoints"]
            assert checkpoints, "manifest has no completed runs"
            if not args.state_dict and manifest.get("state_dicts"):
                args.state_dict = ",".join(
                    next(iter(manifest["state_dicts"].values())))

    ab = ABTesting(args.dataset_name, batch_size=args.batch_size,
                   severity=args.severity)
    valid_indices = _load_valid_indices(args, ab)

    if args.mode == "ABMakeTable":
        ab.ab_make_table(checkpoints, valid_indices, table_path,
                         network=args.network, n_runs=args.N_runs)
    elif args.mode == "CMakeTable":
        ab.c_make_table(checkpoints, valid_indices, table_path,
                        network=args.network, n_runs=args.N_runs,
                        severities=tuple(args.severities))
    elif args.mode == "ABShowImages":
        train_pip = (args.dm_train, args.s_train, args.dn_train)
        test_pip = (args.dm_test, args.s_test, args.dn_test)
        tname = pipeline_name(*train_pip)
        assert tname in checkpoints, \
            f"no checkpoint for train pipeline {tname} in --checkpoints_json"
        out_dir = os.path.join(
            args.out_dir, "imgs",
            f"{args.dataset_name}_{args.augmentation}_"
            f"{args.dm_train[:2]}{args.s_train[0]}{args.dn_train[:2]}_"
            f"{args.dm_test[:2]}{args.s_test[0]}{args.dn_test[:2]}")
        summary = ab.ab_show_images(checkpoints[tname], valid_indices,
                                    train_pip, test_pip, out_dir,
                                    network=args.network)
        print(json.dumps(summary))
    elif args.mode == "CShowImages":
        test_pip = (args.dm_test, args.s_test, args.dn_test)
        tname = pipeline_name(*test_pip)
        assert tname in checkpoints, \
            f"no checkpoint for pipeline {tname} in --checkpoints_json"
        out_dir = os.path.join(args.out_dir.replace("ABtesting", "Ctesting"),
                               "imgs")
        summary = ab.c_show_images(checkpoints[tname], valid_indices,
                                   test_pip, args.transform, args.severity,
                                   out_dir, network=args.network)
        print(json.dumps(summary))
    elif args.mode in ("ABShowAllImages", "CShowAllImages"):
        _show_all_images(args, ab, valid_indices)
    print(f"done: {args.mode}")


def _show_all_images(args, ab, valid_indices):
    """Static galleries: all 12 pipelines (ABShowAllImages) or all
    corruptions x severities (CShowAllImages) — no model, matching the
    reference (ABtesting.py:337-369,395-427)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.evaluation.abtesting import (CORRUPTION_LIST,
                                                    pipeline_grid,
                                                    pipeline_name)
    from raw2logit_tpu.evaluation.corruptions import distort
    from raw2logit_tpu.isp import StaticPipeline
    from raw2logit_tpu.tracking.images import save_image_grid

    first = valid_indices[0] if valid_indices and \
        not isinstance(valid_indices[0], (list, tuple)) else 0
    raw = jnp.asarray(np.stack([ab.dataset[first][0]]))
    out_dir = os.path.join(args.out_dir, "images", args.dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    if args.mode == "ABShowAllImages":
        for (db, sh, dn) in pipeline_grid():
            pipe = StaticPipeline(
                camera_parameters=ab.dataset.camera_parameters,
                debayer=db, sharpening=sh, denoising=dn)
            rgb = jax.jit(lambda r: pipe(r))(raw)
            save_image_grid(np.asarray(rgb), os.path.join(
                out_dir, f"{pipeline_name(db, sh, dn)}.png"))
    else:  # CShowAllImages: every corruption at severities 1..5
        pipe = StaticPipeline(
            camera_parameters=ab.dataset.camera_parameters,
            debayer=args.dm_test, sharpening=args.s_test,
            denoising=args.dn_test)
        rgb = jax.jit(lambda r: pipe(r))(raw)
        for corr in CORRUPTION_LIST:
            row = [np.asarray(distort(jax.random.key(0), rgb, corr, sev))[0]
                   for sev in range(1, 6)]
            save_image_grid(np.stack(row), os.path.join(
                out_dir, f"{corr}.png"))


if __name__ == "__main__":
    main()
