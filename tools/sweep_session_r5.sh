#!/bin/bash
# Round-5 reference-scale sweep (VERDICT r4 items 1+2): 12 static
# pipelines x 5 folds on SyntheticMicroscopy with the CONVERGING recipe
# found this round (12 epochs, lr 1e-3 cosine-to-zero, coupled wd 1e-3,
# weak aug, --precompute_static so the per-step graph is just
# augmentation + ResNet18) — the round-4 3-epoch table had 11/12
# diagonal cells at the 0.508 majority floor; single-fold probes with
# this recipe end at val 0.92-1.0 on previously-floored pipelines.
# Then the full AB matrix (144 cells) and the COMPLETE C battery
# (660 cells) at n_runs=5, via the precomputed-RGB cell programs
# (evaluation/abtesting.py): the C battery now compiles 55 shared
# programs instead of 660 per-cell ones.
#
# Resume-safe at every stage: training/sweep.py --resume skips completed
# jobs (incremental manifest), the table builders skip completed cells
# (and DISCARD on config-fingerprint mismatch instead of mixing).
#
# Reference analog: figures/train.sh:52-81 + figures/ABtesting.py
# ABMakeTable/CMakeTable.
set -u
cd "$(dirname "$0")/.."
LOG=results/sweep_session_r5.log
CPU_ENV=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE
         -u PYTHONPATH JAX_PLATFORMS=cpu
         JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tests)

run() {
  local budget="$1"; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$budget" "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

commit() {
  local msg="$1"; shift
  local have=()
  for p in "$@"; do [ -e "$p" ] && have+=("$p"); done
  if [ "${#have[@]}" -gt 0 ]; then
    git add -A "${have[@]}" "$LOG" 2>/dev/null
    git commit -q -m "$msg" && echo "committed: $msg" | tee -a "$LOG"
  fi
}

run "${SWEEP_BUDGET:-18000}" "${CPU_ENV[@]}" python -m raw2logit_tpu.training.sweep \
  --datasets SyntheticMicroscopy --augmentations weak \
  --epochs 12 --batch_size 8 --lr 1e-3 --weight_decay 1e-3 \
  --lr_schedule cosine --precompute_static --n_splits 5 --resume \
  --out results/sweep_manifest_r5.json
commit "sweep r5: 12 pipelines x 5 folds, converging recipe (12ep cosine wd)" \
  results/sweep_manifest_r5.json

run "${AB_BUDGET:-3600}" "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABMakeTable \
  --dataset_name SyntheticMicroscopy --augmentation weak --N_runs 5 \
  --batch_size 16 \
  --checkpoints_json results/sweep_manifest_r5.json
run 600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak
commit "AB table regenerated on converged r5 models (144 cells, n_runs=5)" \
  results/ABtesting

run "${C_BUDGET:-7200}" "${CPU_ENV[@]}" python figures/ABtesting.py --mode CMakeTable \
  --dataset_name SyntheticMicroscopy --augmentation weak --N_runs 5 \
  --batch_size 16 \
  --checkpoints_json results/sweep_manifest_r5.json
run 600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode CShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak
commit "C corruption table on converged r5 models (660 cells, n_runs=5)" \
  results/ABtesting

echo "=== sweep session r5 done $(date)" | tee -a "$LOG"
