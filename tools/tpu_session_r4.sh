#!/bin/bash
# Round-4 TPU evidence session: regenerate the lost round-3 artifacts
# (VERDICT r3 item 5), produce the per-layer clf_grad ledger (item 3),
# the neural monolith JSON (ADVICE r3), and the per-family bench rows
# (item 6) — one serialized pass over the single-tenant tunneled chip.
#
# Run ONE instance only, with the TPU otherwise free. Each step is its
# own python process (the backend grants the chip per-process); the
# sleep between steps lets the relay release the previous grant.
set -u
cd "$(dirname "$0")/.."
LOG=results/tpu_session_r4.log
GAP="${TPU_GRANT_GAP:-100}"

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "${STEP_BUDGET:-4500}" "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
  sleep "$GAP"
}

# 1. per-layer clf_grad ledger (VERDICT item 3)
run python tools/clf_layer_micro.py 256 20

# 2-4. per-family step attribution (lost artifacts, VERDICT item 5)
run env PROFILE_TASK=segmentation python tools/profile_step.py 64 10
run env PROFILE_TASK=neural python tools/profile_step.py 64 10
run env PROFILE_TASK=adversarial python tools/profile_step.py 256 20

# 5-7. micro dead-end ledgers (lost artifacts, VERDICT item 5)
run python tools/ssim_micro.py
run python tools/opt_micro.py
run python tools/pool_micro.py

# 8. neural monolith measurement (ADVICE r3: README number had no artifact)
run env NN_MONOLITH=1 python tools/nn_isp_micro.py 64 20

# 9. per-family bench rows (reuse the programs cached above)
run env BENCH_FAMILY=segmentation BENCH_MODE=train_staged python bench.py
run env BENCH_FAMILY=neural python bench.py
run env BENCH_FAMILY=adversarial BENCH_MODE=train_staged python bench.py

echo "=== session done $(date)" | tee -a "$LOG"
