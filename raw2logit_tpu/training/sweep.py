"""Experiment-grid sweep driver.

Replaces the reference's sequential bash loops (figures/train.sh:52-81:
12 static pipelines x 3 augmentations x datasets x folds) with a manifest-
driven runner. Each grid point is an independent process — the natural
DCN-parallel dimension (run shards of the grid on separate hosts/slices via
--shard i/n). Emits checkpoints.json for the A/B harness.
"""

import argparse
import json
import os
import subprocess
import sys


def build_grid(datasets, augmentations, epochs, batch_size, lr, n_splits,
               extra_flags=()):
    from raw2logit_tpu.evaluation.abtesting import pipeline_grid, pipeline_name
    jobs = []
    for ds in datasets:
        for aug in augmentations:
            for (db, sh, dn) in pipeline_grid():
                name = pipeline_name(db, sh, dn)
                run_name = f"{ds}_{aug}_{name}"
                argv = ["--dataset", ds, "--processing_mode", "static",
                        "--sp_debayer", db, "--sp_sharpening", sh,
                        "--sp_denoising", dn,
                        "--augmentation", aug,
                        "--epochs", str(epochs),
                        "--batch_size", str(batch_size),
                        "--lr", str(lr), "--n_splits", str(n_splits),
                        "--experiment_name", f"sweep_{ds}",
                        "--run_name", run_name, *extra_flags]
                jobs.append({"run_name": run_name, "pipeline": name,
                             "dataset": ds, "augmentation": aug,
                             "argv": argv})
    return jobs


def _fold_dirs(job):
    """Per-fold run directories a successful job must have left on disk."""
    n_splits = int(job["argv"][job["argv"].index("--n_splits") + 1])
    run_dir = os.path.join("results", "runs", f"sweep_{job['dataset']}",
                           job["run_name"])
    return [os.path.join(run_dir, f"{job['run_name']}_{k}")
            for k in range(n_splits)]


def _job_artifacts_exist(job):
    return all(os.path.exists(os.path.join(d, "state_dict.json"))
               for d in _fold_dirs(job))


def run_sweep(jobs, shard=0, n_shards=1, dry_run=False,
              python=sys.executable, out=None, resume=False):
    """checkpoints maps pipeline -> list of per-fold classifier checkpoints
    (the A/B harness aggregates mean/std over them; state_dicts carries the
    matching per-fold valid_indices files). With multiple datasets or
    augmentations in the grid the flat maps would collide on pipeline
    names, so they are nested under '<dataset>/<augmentation>' configs and
    the flat view is only emitted for a single-config sweep.

    With ``out`` the manifest is (re)written after EVERY job, and
    ``resume=True`` skips jobs already recorded successfully in an
    existing manifest at ``out`` — a budget-truncated sweep continues
    where it stopped instead of retraining 60 folds."""
    manifest = {"jobs": [], "checkpoints": {}, "state_dicts": {},
                "configs": {}}
    done = set()
    if resume and out and os.path.exists(out):
        try:
            with open(out) as fh:
                manifest = json.load(fh)
            kept = [j for j in manifest.get("jobs", [])
                    if j.get("returncode") == 0 and _job_artifacts_exist(j)]
            lost = [j for j in manifest.get("jobs", [])
                    if j.get("returncode") == 0
                    and not _job_artifacts_exist(j)]
            for j in lost:
                # checkpoints vanished (e.g. scratch wipe): retrain, and
                # drop the stale paths so a truncated resume never hands
                # dead checkpoint paths to the A/B harness.
                cfg_key = f"{j['dataset']}/{j['augmentation']}"
                cfg = manifest.get("configs", {}).get(cfg_key, {})
                cfg.get("checkpoints", {}).pop(j["pipeline"], None)
                cfg.get("state_dicts", {}).pop(j["pipeline"], None)
                print(f"resume: artifacts missing, will retrain: "
                      f"{j['run_name']}")
            done = {j["run_name"] for j in kept}
            manifest["jobs"] = kept
            print(f"resuming: {len(done)} jobs already complete")
        except ValueError:
            manifest = {"jobs": [], "checkpoints": {}, "state_dicts": {},
                        "configs": {}}

    def _flush():
        if not out:
            return
        manifest.pop("checkpoints", None)
        manifest.pop("state_dicts", None)
        if len(manifest["configs"]) == 1:
            only = next(iter(manifest["configs"].values()))
            manifest["checkpoints"] = only["checkpoints"]
            manifest["state_dicts"] = only["state_dicts"]
        if os.path.dirname(out):
            os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, out)

    for i, job in enumerate(jobs):
        if i % n_shards != shard:
            continue
        if job["run_name"] in done:
            print(f"[{i + 1}/{len(jobs)}] skip (done): {job['run_name']}")
            continue
        cmd = [python, "train.py", *job["argv"]]
        print(f"[{i + 1}/{len(jobs)}] {' '.join(cmd)}", flush=True)
        if dry_run:
            continue
        rc = subprocess.run(cmd).returncode
        job = dict(job, returncode=rc)
        manifest["jobs"].append(job)
        if rc == 0:
            folds = _fold_dirs(job)
            cfg_key = f"{job['dataset']}/{job['augmentation']}"
            cfg = manifest["configs"].setdefault(
                cfg_key, {"checkpoints": {}, "state_dicts": {}})
            cfg["checkpoints"][job["pipeline"]] = [
                os.path.join(d, "checkpoints", "classifier") for d in folds]
            cfg["state_dicts"][job["pipeline"]] = [
                os.path.join(d, "state_dict.json") for d in folds]
        _flush()
    if len(manifest["configs"]) == 1:
        only = next(iter(manifest["configs"].values()))
        manifest["checkpoints"] = only["checkpoints"]
        manifest["state_dicts"] = only["state_dicts"]
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description="12-pipeline training sweep")
    p.add_argument("--datasets", nargs="+", default=["Microscopy"])
    p.add_argument("--augmentations", nargs="+", default=["weak"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--precompute_static", action="store_true",
                   help="hoist the static ISP out of the per-step graph "
                        "(train.py --precompute_static)")
    p.add_argument("--check_val_every_n_epoch", type=int, default=1)
    p.add_argument("--n_splits", type=int, default=5)
    p.add_argument("--shard", type=int, default=0,
                   help="this host's shard of the grid")
    p.add_argument("--n_shards", type=int, default=1)
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="skip jobs already recorded successfully in the "
                        "manifest at --out")
    p.add_argument("--out", default="results/sweep_manifest.json")
    args = p.parse_args(argv)

    extra = []
    if args.weight_decay:
        extra += ["--weight_decay", str(args.weight_decay)]
    if args.lr_schedule != "constant":
        extra += ["--lr_schedule", args.lr_schedule]
    if args.precompute_static:
        extra += ["--precompute_static"]
    if args.check_val_every_n_epoch != 1:
        extra += ["--check_val_every_n_epoch",
                  str(args.check_val_every_n_epoch)]
    jobs = build_grid(args.datasets, args.augmentations, args.epochs,
                      args.batch_size, args.lr, args.n_splits,
                      extra_flags=tuple(extra))
    manifest = run_sweep(jobs, shard=args.shard, n_shards=args.n_shards,
                         dry_run=args.dry_run, out=args.out,
                         resume=args.resume)
    if not args.dry_run:
        print(f"manifest -> {args.out}")


if __name__ == "__main__":
    main()
