#!/bin/bash
# Round-5 segmentation drift-synthesis session: train a 2x2 static-ISP
# grid ({bilinear,menon2007} x {gaussian,median} @ sharpening_filter) on
# SyntheticDrone (U-Net++/Dice, 16 epochs cosine — the 8-epoch probe
# reached val IoU 0.81, see ROUND5_NOTES), then build the segmentation
# AB table: 4 trained rows x all 12 test pipelines, IoU cells.
#
# The reference measures drift on BOTH tasks (ABsegmentation,
# figures/ABtesting.py:228-272; drone training train.sh); until now the
# committed tables covered classification only. Resume-safe: finished
# checkpoints are skipped, table cells are write-through.
set -u
cd "$(dirname "$0")/.."
LOG=results/seg_ab_session_r5.log
CPU_ENV=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE
         -u PYTHONPATH JAX_PLATFORMS=cpu
         JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tests)

run() {
  local budget="$1"; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$budget" "$@" 2>&1 | grep -v cpu_aot_loader | tee -a "$LOG"
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

for db in bilinear menon2007; do
  for dn in gaussian_denoising median_denoising; do
    name="${db}_sharpening_filter_${dn}"
    ckpt="results/runs/seg_ab/${name}/${name}_0/checkpoints/classifier"
    if [ -d "$ckpt" ] && [ -f "results/runs/seg_ab/${name}/${name}_0/.done" ]; then
      echo "skip $name (checkpoint exists)" | tee -a "$LOG"
      continue
    fi
    run 2400 "${CPU_ENV[@]}" python train.py \
      --dataset SyntheticDrone --processing_mode static \
      --sp_debayer "$db" --sp_sharpening sharpening_filter \
      --sp_denoising "$dn" --precompute_static \
      --epochs 16 --batch_size 4 --n_splits 1 --lr 1e-3 \
      --lr_schedule cosine --weight_decay 1e-3 --augmentation weak \
      --experiment_name seg_ab --run_name "$name" \
      && touch "results/runs/seg_ab/${name}/${name}_0/.done"
  done
done

python - <<'EOF'
import json, os
ckpts = {}
root = "results/runs/seg_ab"
for name in sorted(os.listdir(root)):
    c = os.path.join(root, name, f"{name}_0", "checkpoints", "classifier")
    if os.path.isdir(c):
        ckpts[name] = [c]
json.dump(ckpts, open("results/seg_ab_checkpoints.json", "w"), indent=2)
print("checkpoints:", list(ckpts))
EOF

first=$(python -c "import json;print(sorted(json.load(open('results/seg_ab_checkpoints.json')))[0])")
run 3600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABMakeTable \
  --dataset_name SyntheticDrone \
  --checkpoints_json results/seg_ab_checkpoints.json \
  --state_dict "results/runs/seg_ab/${first}/${first}_0/state_dict.json" \
  --N_runs 1
run 600 "${CPU_ENV[@]}" python figures/ABtesting.py --mode ABShowTable \
  --dataset_name SyntheticDrone --metric iou

echo "=== seg AB session done $(date)" | tee -a "$LOG"
