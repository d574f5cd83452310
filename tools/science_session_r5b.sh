#!/bin/bash
# Round-5 science session, part 3: regenerate the forensics and
# optimization artifacts with the CORRECT aux-loss sign (negative SSIM
# weight = proximity reward; see examples/drift_forensics.py docstring —
# the r5a artifacts were generated at weight +0.3, which drives the
# images APART, so forensics_all collapsed SSIM to 0.07 and failed its
# own pin), then run the full suite so the artifact pins in
# tests/test_examples.py are validated in the same session that
# committed the artifacts (the r5a session died before its suite step —
# the round-4 lesson, relearned).
#
# Waits for the sweep session (PID in /tmp/sweep.pid) to release the
# single CPU core first. Per-step commits.
#
# Reference analogs: README.md:100-118 (forensics), :120-139
# (optimization), train.py:241-273 (adv search).
set -u
cd "$(dirname "$0")/.."
LOG=results/science_session_r5b.log
CPU_ENV=(env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE
         -u PYTHONPATH JAX_PLATFORMS=cpu
         JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tests)

# wait (up to 5 h) for the sweep session to release the CPU core
if [ -f /tmp/sweep.pid ]; then
  pid=$(cat /tmp/sweep.pid)
  for _ in $(seq 1 600); do
    kill -0 "$pid" 2>/dev/null || break
    sleep 30
  done
fi

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

run 7200 "${CPU_ENV[@]}" python examples/drift_forensics.py \
  --targets all additive_layer gamma_correct \
  --pre_epochs 12 --adv_epochs 8 --aux_weight -1.0
commit "Forensics artifacts regenerated with the proximity-reward aux sign" \
  results/forensics_all.json results/forensics_additive_layer.json \
  results/forensics_gamma_correct.json

run 3600 "${CPU_ENV[@]}" python examples/drift_optimization.py --epochs 12
commit "Drift-optimization artifact with learning-curve summary fields" \
  results/drift_optimization.json

run 2400 ./run_tests.sh
commit "science session r5b: full-suite log (artifact pins validated)" results

echo "=== science session r5b done $(date)" | tee -a "$LOG"
