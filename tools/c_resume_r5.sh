#!/bin/bash
# Resume/complete the 660-cell C corruption table on the retrained r5
# checkpoints (VERDICT r4 item 2). The builder is resume-safe per cell
# with a config fingerprint, so this can be interrupted and re-run any
# number of times; COMMIT_EVERY commits the partial table periodically
# so a hard session cutoff loses at most a few cells.
set -u
cd "$(dirname "$0")/.."
LOG=results/c_resume_r5.log
CPU_ENV=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE
         -u PYTHONPATH JAX_PLATFORMS=cpu
         JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tests)

TABLE=results/ABtesting/tables/Ctable_SyntheticMicroscopy_weak.json

# periodic committer: every 5 min, commit the growing table
(
  while sleep 300; do
    [ -e "$TABLE" ] || continue
    git add "$TABLE" 2>/dev/null
    git diff --cached --quiet 2>/dev/null && continue
    git commit -q -m "C table: incremental cells (resume-safe build in progress)"
  done
) &
COMMITTER=$!

echo "=== $(date +%H:%M:%S) CMakeTable resume" | tee -a "$LOG"
timeout "${C_BUDGET:-10800}" "${CPU_ENV[@]}" python figures/ABtesting.py \
  --mode CMakeTable --dataset_name SyntheticMicroscopy --augmentation weak \
  --N_runs 5 --batch_size 16 \
  --checkpoints_json results/sweep_manifest_r5.json 2>&1 | tee -a "$LOG"
echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"

kill "$COMMITTER" 2>/dev/null

timeout 600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode CShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak 2>&1 | tee -a "$LOG"

git add -A results/ABtesting "$LOG" 2>/dev/null
git commit -q -m "C corruption table on converged r5 models (n_runs=5) + heatmap" \
  && echo committed | tee -a "$LOG"
echo "=== c_resume_r5 done $(date)" | tee -a "$LOG"
