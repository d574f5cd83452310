#!/usr/bin/env python
"""Provenance check after the session-3 checkpoint loss (VM reset).

The committed AB table (results/ABtesting/tables/
ABtable_SyntheticMicroscopy_weak.json) was built from the ORIGINAL r5
sweep checkpoints, which were wiped with the scratch disk; the table's
_meta fingerprint hashes checkpoint PATHS, so the retrained sweep
matches it trivially. This script proves the retrained models are the
same models: it recomputes a handful of AB cells from the retrained
checkpoints through the exact ab_make_table evaluation path and compares
against the committed cells. CPU training here is single-threaded and
fully seeded, so the retrained checkpoints should reproduce the
committed numbers exactly; any mismatch is printed and exits non-zero.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python tools/check_ab_determinism_r5.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLE = "results/ABtesting/tables/ABtable_SyntheticMicroscopy_weak.json"
MANIFEST = "results/sweep_manifest_r5.json"

# one converged diagonal, one floor off-diagonal, one malvar<->menon
# transfer cell — the three regimes of the committed table
CELLS = [
    ("bilinear_sharpening_filter_gaussian_denoising",
     ("bilinear", "sharpening_filter", "gaussian_denoising")),
    ("bilinear_sharpening_filter_gaussian_denoising",
     ("menon2007", "unsharp_masking", "median_denoising")),
    ("malvar2004_sharpening_filter_gaussian_denoising",
     ("menon2007", "sharpening_filter", "gaussian_denoising")),
]


def main():
    from raw2logit_tpu.evaluation.abtesting import ABTesting, pipeline_name

    with open(TABLE) as fh:
        table = json.load(fh)
    with open(MANIFEST) as fh:
        manifest = json.load(fh)
    checkpoints = manifest["checkpoints"]
    state_dicts = next(iter(manifest["state_dicts"].values()))
    per_fold = []
    for path in state_dicts:
        with open(path) as fh:
            per_fold.append(json.load(fh)["valid_indices"])

    ab = ABTesting("SyntheticMicroscopy", batch_size=16)
    meta = table.get("_meta", {})
    n_runs = meta.get("n_runs", 5)
    network = meta.get("network", "resnet18")

    failures = 0
    for tname, (db_e, sh_e, dn_e) in CELLS:
        cell = f"{tname}__VS__{pipeline_name(db_e, sh_e, dn_e)}"
        want = table[cell]
        got = ab.evaluate_runs(checkpoints[tname], per_fold,
                               db_e, sh_e, dn_e, network=network,
                               n_runs=n_runs)
        match = all(abs(got[k] - want[k]) < 1e-9 for k in want)
        print(f"{cell}:\n  committed {want}\n  retrained {got}"
              f"  -> {'MATCH' if match else 'MISMATCH'}")
        failures += 0 if match else 1
    if failures:
        print(f"{failures}/{len(CELLS)} cells mismatch: retraining is NOT "
              "bit-reproducing the committed table")
        return 1
    print("retrained checkpoints reproduce the committed AB cells exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
