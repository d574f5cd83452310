#!/bin/bash
# Round-4 reference-scale sweep (VERDICT r3 item 9): 12 static pipelines
# x 5 folds x 3 epochs on SyntheticMicroscopy, then refreshed AB (144
# cells) and C (660 cells) tables whose sigma columns aggregate n_runs=5
# folds — replacing the round-3 n_runs=2 tables whose sigma was
# statistically decorative. CPU-only (single core; run with the TPU
# session finished so the timings there stay clean).
#
# Commits each artifact as it lands (the driving sessions this round
# have died mid-run more than once), and every stage runs under a hard
# timeout so the sweep cannot still be running when the round-end
# driver takes the machine for bench.py.
#
# Reference analog: figures/train.sh:52-81 (12 pipelines x augs x 5
# folds, 100 epochs) driven by sequential bash loops; epochs here follow
# VERDICT r3 item 9's "even at few epochs" budget note.
set -u
cd "$(dirname "$0")/.."
LOG=results/sweep_session_r4.log
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

run "${SWEEP_BUDGET:-5400}" "${CPU_ENV[@]}" python -m raw2logit_tpu.training.sweep \
  --datasets SyntheticMicroscopy --augmentations weak \
  --epochs 3 --batch_size 8 --lr 1e-3 --n_splits 5 \
  --out results/sweep_manifest_r4.json
commit "sweep: 12 pipelines x 5 folds x 3 epochs manifest (item 9)" \
  results/sweep_manifest_r4.json

# The table builders RESUME from any existing file at the canonical
# paths (completed cells are skipped), so re-running this script
# continues a budget-truncated C battery instead of starting over. The
# round-3 n_runs=2 tables were moved to *_r3_nruns2.json first (they
# would otherwise be mistaken for completed n_runs=5 cells).

run "${AB_BUDGET:-3600}" "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABMakeTable \
  --dataset_name SyntheticMicroscopy --augmentation weak --N_runs 5 \
  --checkpoints_json results/sweep_manifest_r4.json
run 600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak
commit "AB tables refreshed at n_runs=5 (144 cells)" results/ABtesting

run "${C_BUDGET:-4500}" "${CPU_ENV[@]}" python figures/ABtesting.py --mode CMakeTable \
  --dataset_name SyntheticMicroscopy --augmentation weak --N_runs 5 \
  --checkpoints_json results/sweep_manifest_r4.json
run 600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode CShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak
commit "C corruption tables refreshed at n_runs=5 (660 cells)" results/ABtesting

echo "=== sweep session done $(date)" | tee -a "$LOG"
