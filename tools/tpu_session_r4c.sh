#!/bin/bash
# Round-4 TPU evidence session, part C: the steps parts A/B did not
# finish (both driving sessions died API-side mid-run; opt_micro printed
# its rows twice but never reached the end-of-run JSON write). Run under
# tmux so it survives the driving session, and COMMIT each artifact as
# it lands so no measurement is ever lost to a third interruption.
#
# Remaining:
#   - opt_micro + pool_micro (lost round-3 artifacts, VERDICT item 5;
#     pool_micro also probes the 2-stage maxpool decomposition lead)
#   - neural monolith measurement (ADVICE r3)
#   - seg optimized-HLO byte tally ledger (VERDICT r3 weak #4)
#   - per-family bench rows (item 6; programs cached by parts A/B)
#
# Run ONE instance only, with the TPU otherwise free.
set -u
cd "$(dirname "$0")/.."
LOG=results/tpu_session_r4c.log
GAP="${TPU_GRANT_GAP:-100}"

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "${STEP_BUDGET:-4500}" "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
  sleep "$GAP"
}

# commit <msg> <paths...> — commit an artifact the moment it exists
commit() {
  local msg="$1"; shift
  local have=()
  for p in "$@"; do [ -e "$p" ] && have+=("$p"); done
  if [ "${#have[@]}" -gt 0 ]; then
    git add "${have[@]}" "$LOG" 2>/dev/null
    git commit -q -m "$msg" && echo "committed: $msg" | tee -a "$LOG"
  fi
}

run python tools/opt_micro.py
commit "opt_micro: commit the optimizer-variant chip timings" \
  results/opt_micro.json

run python tools/pool_micro.py 256 30
commit "pool_micro: measure the exact 2-stage maxpool decomposition" \
  results/pool_micro.json

run env NN_MONOLITH=1 python tools/nn_isp_micro.py 64 20
commit "nn_isp_micro: commit the neural-ISP monolith measurement" \
  results/nn_isp_step_tpu_monolith.json

run python tools/seg_hlo_dump.py 64
commit "seg_hlo_dump: commit the segmentation HLO byte-tally ledger" \
  results/seg_hlo_tally.json

bench_family() {
  local fam="$1" mode="${2:-}"
  local out="results/bench_family_${fam}.json"
  echo "=== $(date +%H:%M:%S) bench family=$fam mode=$mode" | tee -a "$LOG"
  if [ -n "$mode" ]; then
    timeout "${STEP_BUDGET:-4500}" env BENCH_FAMILY="$fam" \
      BENCH_MODE="$mode" python bench.py 2>>"$LOG" | tee -a "$LOG" | \
      tail -n 1 > "$out"
  else
    timeout "${STEP_BUDGET:-4500}" env BENCH_FAMILY="$fam" \
      python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -n 1 > "$out"
  fi
  echo "=== rc=$? $(date +%H:%M:%S)" | tee -a "$LOG"
  # only keep/commit a valid JSON line
  python -c "import json;json.load(open('$out'))" 2>/dev/null \
    && commit "bench: per-family TPU row ($fam)" "$out" \
    || rm -f "$out"
  sleep "$GAP"
}

bench_family segmentation train_staged
bench_family neural
bench_family adversarial train_staged

echo "=== session done $(date)" | tee -a "$LOG"
