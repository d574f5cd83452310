#!/bin/bash
# Round-4 reference-scale sweep (VERDICT r3 item 9): 12 static pipelines
# x 5 folds x 3 epochs on SyntheticMicroscopy, then refreshed AB (144
# cells) and C (660 cells) tables whose sigma columns aggregate n_runs=5
# folds — replacing the round-3 n_runs=2 tables whose sigma was
# statistically decorative. CPU-only (single core; run with the TPU
# session finished so the timings there stay clean).
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
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

run "${CPU_ENV[@]}" python -m raw2logit_tpu.training.sweep \
  --datasets SyntheticMicroscopy --augmentations weak \
  --epochs 3 --batch_size 8 --lr 1e-3 --n_splits 5 \
  --out results/sweep_manifest_r4.json

run "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABMakeTable \
  --dataset_name SyntheticMicroscopy --augmentation weak --N_runs 5 \
  --checkpoints_json results/sweep_manifest_r4.json

run "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak

run "${CPU_ENV[@]}" python figures/ABtesting.py --mode CMakeTable \
  --dataset_name SyntheticMicroscopy --augmentation weak --N_runs 5 \
  --checkpoints_json results/sweep_manifest_r4.json

run "${CPU_ENV[@]}" python figures/ABtesting.py --mode CShowTable \
  --dataset_name SyntheticMicroscopy --augmentation weak

echo "=== sweep session done $(date)" | tee -a "$LOG"
